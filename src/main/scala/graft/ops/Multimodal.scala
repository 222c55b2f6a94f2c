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

  /** Perceptual-hash STUB ==========================================
    * Real image near-dup detection hashes decoded PIXELS (aHash/pHash:
    * downscale, compare each cell to the global mean, one bit per
    * cell). The codec is stubbed (no imaging libs in this container),
    * so the SAME algorithm runs on the payload BYTES: 63 equal
    * byte-blocks, bit b set iff block b's mean byte value exceeds the
    * whole payload's mean — integer cross-multiplied so the compare is
    * exact and the DuckDB oracle reproduces every bit. 63 bits keeps
    * every band value and the hash itself positive in a signed 64-bit
    * lane on both engines. Locality is real: flipping a few payload
    * bytes flips few hash bits, so the Hamming band join downstream is
    * exercised exactly as it would be on codec output. */
  val PHashBits = 63

  def phash63(bytes: Array[Byte]): Long = {
    val len = bytes.length
    if (len == 0) return 0L
    var total = 0L
    var i = 0
    while (i < len) { total += (bytes(i) & 0xff); i += 1 }
    var h = 0L
    var b = 0
    while (b < PHashBits) {
      // block b covers 0-based positions [b*len/63, (b+1)*len/63)
      val lo = (b.toLong * len / PHashBits).toInt
      val hi = ((b + 1).toLong * len / PHashBits).toInt
      if (hi > lo) {
        var s = 0L
        var j = lo
        while (j < hi) { s += (bytes(j) & 0xff); j += 1 }
        // mean(block) > mean(all) without division: s/ (hi-lo) > total/len
        if (s * len > total * (hi - lo)) h |= (1L << b)
      }
      b += 1
    }
    h
  }

  /** Batch fingerprint: the same mapPartitions shape as [[decodeBatch]]
    * (a real pipeline hashes right after decode, codec state shared per
    * partition); one scan, map-only, no shuffle. */
  def phashBatch(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id").cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, phash63(bytes)) })
      .toDF("doc_id", "phash")
  }

  /** Hamming near-dup pairs over perceptual hashes via a BAND equi-join
    * — the 100 TB shape (no all-pairs anywhere): split the 63-bit hash
    * into `bands` equal slices; by pigeonhole two hashes within Hamming
    * distance `bands − 1` agree exactly on ≥1 slice, so for
    * `maxHamming ≤ bands − 1` the band join is a LOSSLESS candidate
    * filter (recall 1.0 — this query is oracle-checkable, unlike the
    * probabilistic LSH paths) and the exact bit_count verify keeps
    * precision 1.0. Default 4×15-bit bands / threshold 3: losslessness
    * needs only `threshold + 1` bands (3 flips damage ≤ 3 of 4 bands —
    * flips landing in the 3 unbanded top bits damage none), so the
    * minimal band count buys the widest bands: 32768 buckets/band vs
    * 512 for the earlier 7×9 split — chance collisions effectively
    * vanish and the banded row count drops 4/7, at identical results
    * (the 3× scale probes kept showing band fan-out as where
    * super-linear cost hides: 14.0 s → 5.8 s at 9×7→7×9, 5.9×
    * growth ratio still at 7×9). At larger corpora still, segment
    * buckets further by cheap exact metadata (format, size band). */
  def phashBandPairs(hashes: DataFrame, maxHamming: Int = 3,
      bands: Int = 4): DataFrame = {
    require(maxHamming <= bands - 1,
      s"band join is only lossless up to Hamming ${bands - 1} with $bands bands")
    val bits = PHashBits / bands
    val banded = hashes.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bkey",
        expr(s"shiftright(phash, band * $bits)")
          .bitwiseAND(lit((1L << bits) - 1)))
    val a = banded.select(col("band"), col("bkey"),
      col("doc_id").as("id_a"), col("phash").as("ph_a"))
    val b = banded.select(col("band"), col("bkey"),
      col("doc_id").as("id_b"), col("phash").as("ph_b"))
    // verify FIRST, dedup the ANSWER: hamming is a pure function of
    // the pair and both hashes already ride the band join row, so the
    // bit_count filter is free map-side CPU — running it ahead of the
    // dropDuplicates shrinks that hash exchange from candidate volume
    // (band fan-out, the superlinear term — r14 10×/3× ratio 3.54) to
    // answer volume. Same rows out either way (a duplicate candidate
    // instance of a pair carries the same hamming).
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        expr("bit_count(ph_a ^ ph_b)").cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Audio-codec STUB =========================================
    * Real audio feature extraction decodes frames then computes
    * windowed energy; the codec is stubbed (no audio libs in this
    * container), so the SAME windowed-energy pass runs on the payload
    * bytes as 8-bit PCM centered at 128. All-integer arithmetic
    * (sum of squared deviations per 64-sample window) so the DuckDB
    * oracle reproduces every value. */
  val AudioWindow = 64

  /** Per-doc windowed energy profile: window count, total energy,
    * peak window (argmax energy, earliest on ties), and silence
    * ratio (windows under an RMS≈16 threshold). One mapPartitions
    * pass — per-partition codec init point, like decodeBatch. */
  def audioEnergy(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id").cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // val codec = AudioCodec.open()  // per-partition init (STUB)
        it.flatMap { case (id, bytes) =>
          val nw = bytes.length / AudioWindow
          if (nw == 0) Iterator.empty
          else {
            var total = 0L; var peak = Long.MinValue; var peakIdx = -1
            var silent = 0L
            var w = 0
            while (w < nw) {
              var ss = 0L
              var i = w * AudioWindow
              val end = i + AudioWindow
              while (i < end) {
                val s = (bytes(i) & 0xff) - 128
                ss += s.toLong * s
                i += 1
              }
              total += ss
              if (ss > peak) { peak = ss; peakIdx = w }
              if (ss < AudioWindow.toLong * 16 * 16) silent += 1
              w += 1
            }
            Iterator((id, nw.toLong, total, peak, peakIdx.toLong, silent))
          }
        }
      }
      .toDF("doc_id", "n_windows", "total_energy", "peak_energy",
        "peak_window", "silent_windows")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // audio energy profile over stubbed PCM payloads — all-integer,
    // fully oracle-checked; the mapPartitions shape is where codec
    // state lives in a real deployment
    "mm_audio_energy" -> { (s, dir) =>
      audioEnergy(payloads(s, dir)).orderBy(col("doc_id"))
    },
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
    // perceptual-hash near-dup, anchor form: the 15 closest payload
    // pairs by Hamming distance over the 63-bit block-mean hash —
    // all-pairs is the deliberate small-scale anchor (the band join
    // below is the scale path); fully oracle-checked since every hash
    // bit is integer arithmetic DuckDB reproduces
    "mm_phash_topk" -> { (s, dir) =>
      val h = phashBatch(payloads(s, dir)
        .filter(length(col("payload")) > 0))
      val a = h.select(col("doc_id").as("id_a"), col("phash").as("ph_a"))
      val b = h.select(col("doc_id").as("id_b"), col("phash").as("ph_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("hamming", expr("bit_count(ph_a ^ ph_b)").cast(LongType))
        .orderBy(col("hamming"), col("id_a"), col("id_b"))
        .limit(15)
        .select(col("id_a"), col("id_b"), col("hamming"))
    },
    // perceptual-hash near-dup, scale form: 9×7-bit band equi-join +
    // exact Hamming verify at the production image threshold (≤3 bits
    // of 63). Lossless by pigeonhole (3 < 9 bands), so this shares the
    // all-pairs oracle EXACTLY — recall 1.0 is provable, not sampled.
    // The synthetic byte-payload corpus has no pairs this close
    // (nearest is Hamming ~10): the correct, oracle-confirmed answer is
    // empty here, and OpsSpec plants byte-flipped payload dups to lock
    // in the find-behavior the corpus can't exercise.
    "mm_phash_dedup" -> { (s, dir) =>
      phashBandPairs(
        phashBatch(payloads(s, dir).filter(length(col("payload")) > 0)))
        .orderBy(col("id_a"), col("id_b"))
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
    },

    // cross-modality coverage report: per source, how many docs have a
    // matching embedding row and how many embeddings are orphaned (no
    // doc) — the data-quality join audit every multimodal pipeline runs
    // before training (a silent 30% missing-embedding source skews a
    // mixture). One outer join on the shared id space + one bounded
    // aggregate; at 100 TB both sides bucket by id and the exchange
    // vanishes.
    "mm_coverage_report" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      val vecs = t(s, dir, "embeddings").select(col("vec_id"))
      docs.join(vecs, col("doc_id") === col("vec_id"), "full_outer")
        .groupBy(coalesce(col("source"), lit("_orphan_vec")).as("source"))
        .agg(count(col("doc_id")).as("n_docs"),
          count(col("vec_id")).as("n_with_vec"),
          sum(when(col("vec_id").isNull, 1L).otherwise(0L))
            .as("n_missing_vec"))
        .withColumn("coverage",
          round(when(col("n_docs") === 0, lit(0.0))
            .otherwise(col("n_with_vec").cast(DoubleType) / col("n_docs")),
            6))
        .orderBy(col("source"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    // BYTE semantics, self-guarding: the Spark side iterates UTF-8
    // payload bytes, and this DuckDB build (v1.0) cannot index BLOB
    // bytes — so L is the true byte length (octet_length over encode)
    // and byte values come from ord(char), valid ONLY while text is
    // pure ASCII. The error() guard makes that precondition loud: any
    // non-ASCII doc aborts the oracle instead of silently comparing
    // char semantics against byte semantics.
    "mm_audio_energy" ->
      s"""WITH d AS (SELECT doc_id, text,
         |    CASE WHEN length(text) <> octet_length(encode(text))
         |      THEN error('mm_audio_energy oracle requires ASCII text')
         |      ELSE octet_length(encode(text)) END AS L
         |  FROM documents
         |  WHERE octet_length(encode(text)) >= $AudioWindow),
         |cp AS (SELECT doc_id, L // $AudioWindow AS nw,
         |    list_transform(range(1, L+1),
         |      i -> ord(substr(text, i, 1))) AS b
         |  FROM d),
         |wi AS (SELECT doc_id, nw, b,
         |    unnest(range(0, nw)) AS wi FROM cp),
         |w AS (SELECT doc_id, nw, wi,
         |    CAST(list_sum(list_transform(
         |      b[wi * $AudioWindow + 1 : (wi + 1) * $AudioWindow],
         |      x -> (x - 128) * (x - 128))) AS BIGINT) AS ss
         |  FROM wi),
         |pk AS (SELECT doc_id, ss AS peak_energy, wi AS peak_window
         |  FROM w QUALIFY row_number() OVER (PARTITION BY doc_id
         |    ORDER BY ss DESC, wi) = 1)
         |SELECT w.doc_id, CAST(max(nw) AS BIGINT) AS n_windows,
         |  CAST(sum(ss) AS BIGINT) AS total_energy,
         |  max(pk.peak_energy) AS peak_energy,
         |  max(pk.peak_window) AS peak_window,
         |  CAST(sum(CASE WHEN ss < ${AudioWindow * 16 * 16}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS silent_windows
         |FROM w JOIN pk ON pk.doc_id = w.doc_id
         |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin,
    "mm_coverage_report" ->
      """SELECT COALESCE(d.source, '_orphan_vec') AS source,
        |  count(d.doc_id) AS n_docs,
        |  count(e.vec_id) AS n_with_vec,
        |  CAST(sum(CASE WHEN e.vec_id IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_missing_vec,
        |  round(CASE WHEN count(d.doc_id) = 0 THEN 0.0
        |    ELSE count(e.vec_id) / CAST(count(d.doc_id) AS DOUBLE) END, 6)
        |    AS coverage
        |FROM documents d FULL JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY 1 ORDER BY source""".stripMargin,
    // the 63-bit block-mean hash in plain SQL: the payload is the UTF-8
    // bytes of `text` (pure ASCII — ord(char) IS the byte), blocks and
    // the bit rule integer-cross-multiplied exactly like phash63
    "mm_phash_topk" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS L
        |  FROM documents WHERE length(text) > 0),
        |t AS (SELECT doc_id, L,
        |    list_transform(range(1, L+1), i -> ord(substr(text, i, 1))) AS cp
        |  FROM d),
        |s AS (SELECT doc_id, L, cp, CAST(list_sum(cp) AS BIGINT) AS total
        |  FROM t),
        |h AS (SELECT doc_id,
        |    list_reduce(list_transform(range(0, 63), b ->
        |      CASE WHEN ((b+1)*L)//63 > (b*L)//63
        |        AND CAST(list_sum(cp[(b*L)//63 + 1 : ((b+1)*L)//63])
        |              AS BIGINT) * L > total * (((b+1)*L)//63 - (b*L)//63)
        |      THEN 1::BIGINT << b ELSE 0::BIGINT END), (x,y) -> x | y) AS ph
        |  FROM s)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.ph, b.ph)) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |ORDER BY hamming, id_a, id_b LIMIT 15""".stripMargin,
    "mm_phash_dedup" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS L
        |  FROM documents WHERE length(text) > 0),
        |t AS (SELECT doc_id, L,
        |    list_transform(range(1, L+1), i -> ord(substr(text, i, 1))) AS cp
        |  FROM d),
        |s AS (SELECT doc_id, L, cp, CAST(list_sum(cp) AS BIGINT) AS total
        |  FROM t),
        |h AS (SELECT doc_id,
        |    list_reduce(list_transform(range(0, 63), b ->
        |      CASE WHEN ((b+1)*L)//63 > (b*L)//63
        |        AND CAST(list_sum(cp[(b*L)//63 + 1 : ((b+1)*L)//63])
        |              AS BIGINT) * L > total * (((b+1)*L)//63 - (b*L)//63)
        |      THEN 1::BIGINT << b ELSE 0::BIGINT END), (x,y) -> x | y) AS ph
        |  FROM s)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.ph, b.ph)) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
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
