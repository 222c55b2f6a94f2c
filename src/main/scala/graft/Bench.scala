package graft

import org.apache.spark.sql.SparkSession

/** Perf harness: runs the headline queries (the compute-heavy
  * representatives of each operator family — ingest roundtrips are
  * excluded since they mostly measure CSV re-export) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver. */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q_window_topn_orders", "q_distinct_agg", "q_rollup_orders",
    "q_asof_join", "q_percentiles", "q_salted_join",
    "dedup_minhash", "dedup_simhash", "dedup_embedding_cosine",
    "dedup_embedding_ann", // the banded scale path beside its exact anchor
    "sim_topk_bruteforce", "sim_topk_lsh", "sim_topk_ivf",
    "text_quality", "text_term_freq", "text_fingerprint",
    "text_contamination", "pipeline_pack_sequences",
    "mm_decode_meta", "stream_hourly_window", "stream_sessionize")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen once on the smallest sf so per-query numbers
    // measure the query, not first-job session setup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      // a failed query reports -1 so it can never pass as a fast success
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
