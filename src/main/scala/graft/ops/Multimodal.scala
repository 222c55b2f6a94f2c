package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in distributed batches.
  *
  * The container has no imaging/audio libraries, so the *decode* step is
  * a clearly-marked deterministic STUB (`fakeDecode`) — but everything
  * Spark-side is real and scale-shaped: binary payload columns, a typed
  * metadata struct, `mapPartitions` batch processing with a proper
  * `Encoder` (one decoder init per partition, the same shape a JNI/FFI
  * image codec or a Pandas-UDF batch would use), and per-partition
  * batching for the frame sampler.
  */
object Multimodal {

  /** Media metadata record produced by "decoding". */
  case class MediaMeta(
      doc_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, n_frames: Int, gray_mean: Double)

  /** STUB decoder ==========================================
    * A real implementation would hand `bytes` to an image/audio codec
    * (e.g. via a JNI binding or an Arrow batch to a Python worker).
    * Offline container → deterministic fake derived from the payload
    * byte sum, so tests AND the DuckDB oracle can reproduce every
    * field with plain arithmetic (making this query fully
    * oracle-checked, not rows-only). */
  def fakeDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    val mean = s.toDouble / math.max(n, 1L)
    MediaMeta(docId, n,
      Seq("jpeg", "png", "webp")((s % 3).toInt),
      (320 + s % 1600).toInt,
      (240 + (s * 31 + n) % 840).toInt,
      (1 + (s + 7 * n) % 120).toInt,
      mean)
  }

  /** Batch decode: one `mapPartitions` pass — codec state would be
    * initialised once per partition here, not per row. */
  def decodeBatch(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id").cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // val codec = Codec.open()  // per-partition init point (STUB)
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
      .toDF()
  }

  /** Synthesize binary payloads from the documents table (UTF-8 bytes
    * stand in for real media blobs). */
  def payloads(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column plumbing: payload sizes + hashes (oracle-checked —
    // DuckDB sees the identical UTF-8 bytes via CAST(text AS BLOB))
    "mm_binary_meta" -> { (s, dir) =>
      payloads(s, dir)
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("sha"),
          md5(col("payload")).as("payload_md5"))
        .orderBy(col("doc_id"))
    },
    // distributed batch "decode" → typed metadata (STUB decode whose
    // arithmetic the DuckDB oracle reproduces byte-for-byte)
    "mm_decode_meta" -> { (s, dir) =>
      decodeBatch(payloads(s, dir)).orderBy(col("doc_id"))
    },
    // resize planning: aspect-preserving fit into 224×224 over the
    // decoded dims (the byte-resample itself is the stubbed codec step;
    // the Spark-side plumbing and dim arithmetic are real + oracled)
    "mm_resize_meta" -> { (s, dir) =>
      decodeBatch(payloads(s, dir))
        .withColumn("scale",
          least(lit(224.0) / col("width"), lit(224.0) / col("height")))
        .select(col("doc_id"), col("width"), col("height"),
          floor(col("width") * col("scale")).cast(IntegerType).as("out_w"),
          floor(col("height") * col("scale")).cast(IntegerType).as("out_h"))
        .orderBy(col("doc_id"))
    },
    // frame sampling: every 64-byte "frame", keep each 8th (oracle-
    // checked: pure byte arithmetic, portable to DuckDB substring math)
    "mm_frame_sample" -> { (s, dir) =>
      payloads(s, dir)
        // zero-length payloads: Spark's sequence(0,-1) would emit a
        // descending range (a spurious frame) where DuckDB emits none
        .filter(length(col("payload")) > 0)
        .select(col("doc_id"), col("payload"),
          explode(sequence(lit(0),
            floor((length(col("payload")) - 1) / 64).cast(IntegerType)))
            .as("frame_idx"))
        .filter(col("frame_idx") % 8 === 0)
        .select(col("doc_id"), col("frame_idx"),
          length(col("payload").substr(col("frame_idx") * 64 + 1, lit(64)))
            .as("frame_bytes"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    // this DuckDB build only hashes VARCHAR; the documents text is pure
    // ASCII (verified), so hashing the string hashes the same bytes
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  sha256(text) AS sha,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the byte-sum s and length n drive every fake-decoded field; text
    // is pure ASCII (verified) so ord(char) == byte value
    "mm_decode_meta" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n,
        |    CAST(CASE WHEN length(text) = 0 THEN 0 ELSE
        |      list_reduce(list_transform(range(1, length(text)+1),
        |        i -> ord(substr(text, i, 1))), (a, b) -> a + b) END
        |      AS BIGINT) AS s
        |  FROM documents)
        |SELECT doc_id, n AS n_bytes,
        |  CASE s % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |    ELSE 'webp' END AS format,
        |  CAST(320 + s % 1600 AS INT) AS width,
        |  CAST(240 + (s * 31 + n) % 840 AS INT) AS height,
        |  CAST(1 + (s + 7 * n) % 120 AS INT) AS n_frames,
        |  s / greatest(n, 1) AS gray_mean
        |FROM b ORDER BY doc_id""".stripMargin,
    "mm_resize_meta" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n,
        |    CAST(CASE WHEN length(text) = 0 THEN 0 ELSE
        |      list_reduce(list_transform(range(1, length(text)+1),
        |        i -> ord(substr(text, i, 1))), (a, b) -> a + b) END
        |      AS BIGINT) AS s
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    CAST(320 + s % 1600 AS INT) AS width,
        |    CAST(240 + (s * 31 + n) % 840 AS INT) AS height
        |  FROM b)
        |SELECT doc_id, width, height,
        |  CAST(floor(width * least(224.0 / width, 224.0 / height)) AS INT)
        |    AS out_w,
        |  CAST(floor(height * least(224.0 / width, 224.0 / height)) AS INT)
        |    AS out_h
        |FROM d ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, frame_idx,
        |  length(substring(text, CAST(frame_idx*64+1 AS INT), 64))
        |    AS frame_bytes
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(range(0, (octet_length(CAST(text AS BLOB))-1)//64 + 1))
        |      AS frame_idx
        |  FROM documents WHERE length(text) > 0)
        |WHERE frame_idx % 8 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
