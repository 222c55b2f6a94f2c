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
    // production-threshold ANN (τ=0.9, 8×10 multiprobe) carries the
    // realistic banded-dedup cost; the τ=0.45 anchor-matching variant
    // (48 tables) is deliberately excluded — its cost is an artifact of
    // oracle-matching recall at an unrealistically loose threshold
    "dedup_embedding_ann_tight",
    "dedup_containment_lsh", // prefix-filter inverted-index scale path
    "sim_topk_bruteforce", "sim_topk_lsh", "sim_topk_ivf",
    "text_quality", "text_term_freq", "text_fingerprint",
    "text_contamination", "pipeline_pack_sequences_sharded",
    "text_bigram_lm", "q_zorder_key",
    "mm_decode_meta", "stream_hourly_window", "stream_sessionize",
    // round-5 additions: batch-vs-index dedup (the production
    // incremental mode), iterative-graph representative, the blocked
    // fuzzy join (quadratic-in-block record linkage), the band join's
    // equi-join scale path, and streaming windowed count-distinct
    "dedup_incr_minhash", "graph_pagerank",
    "link_fuzzy_pairs", "q_range_band_join_blocked",
    "stream_hourly_uniques")

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
    // round-4 lesson: a single timed run per query made a uniform +20%
    // drift across untouched queries indistinguishable from real plan
    // regressions. Per query: one untimed warm-up, then median of 3
    // timed runs; caches cleared between queries so one query's persist
    // can't pressure the next one's executors.
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def run(name: String): Unit = SparkEntry.queries(name)(spark, sfDir).count()
    def clear(): Unit = spark.catalog.clearCache()
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val ok = try { run(name); true } // warm-up, untimed
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val med = if (!ok) -1.0 else {
        val times = (1 to timedRuns).map { _ =>
          clear()
          val t0 = System.nanoTime()
          run(name)
          (System.nanoTime() - t0) / 1e9
        }.sorted
        times(times.size / 2)
      }
      clear()
      // a failed query reports -1 so it can never pass as a fast success
      name -> med
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$timedRuns,"stat":"median"}""")
    spark.stop()
  }
}
