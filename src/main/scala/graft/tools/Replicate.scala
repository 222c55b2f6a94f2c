package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-point generator: writes `outDir` as K copies of `sfDir` with
  * keys remapped to stay unique and FK-consistent, so the bench can
  * probe a scale factor the driver didn't ship (e.g. 3× sf0.1 ≈
  * sf0.3) and catch super-linear blowups the single-SF gate can't see.
  *
  * Key remap: replica i offsets every primary/foreign key by
  * i × 10^12 — ids stay LongType, joins stay consistent WITHIN a
  * replica, and cross-replica keys can never collide (driver ids are
  * far below 10^12). Replicated text gets a per-replica suffix token
  * and replicated embeddings a deterministic small per-replica
  * rotation, so dedup/similarity workloads see near-duplicates across
  * replicas (the realistic shape of a grown corpus — a crawl re-crawls
  * mostly-same pages) instead of exact clones degenerating every
  * fingerprint bucket.
  *
  * Usage: runMain graft.tools.Replicate <sfDir> <outDir> <k>
  */
object Replicate {
  val Offset = 1000000000000L // 10^12

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, k) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet")

    /** K stacked copies; `remap` receives the replica index column. */
    def replicate(df: DataFrame, keyCols: Seq[String],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val shifted = keyCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * Offset)))
        extra(shifted, i)
      }.reduce(_ unionAll _)

    val jobs: Seq[(String, DataFrame)] = Seq(
      // dims shared by every replica: copy once, unchanged
      "region" -> t("region"),
      "nation" -> t("nation"),
      "customer" -> replicate(t("customer"), Seq("c_custkey")),
      "supplier" -> replicate(t("supplier"), Seq("s_suppkey")),
      "part" -> replicate(t("part"), Seq("p_partkey")),
      "orders" -> replicate(t("orders"), Seq("o_orderkey", "o_custkey")),
      "lineitem" -> replicate(t("lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> replicate(t("events"), Seq("event_id", "user_id")),
      "documents" -> replicate(t("documents"), Seq("doc_id"),
        (d, i) => if (i == 0) d else d
          .withColumn("text", concat(col("text"), lit(s" replica$i")))
          .withColumn("n_chars",
            col("n_chars") + lit(s" replica$i".length.toLong))),
      "embeddings" -> replicate(t("embeddings"), Seq("vec_id"),
        // deterministic tiny perturbation: bump one dimension per
        // replica by 2% — near- but not exact-duplicate vectors
        (d, i) => if (i == 0) d else d
          .withColumn("embedding", transform(col("embedding"), (x, j) =>
            when(j === (i % 64), x * lit(1.02f)).otherwise(x))))
    )
    jobs.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[replicate] $name done")
    }
    spark.stop()
  }
}
