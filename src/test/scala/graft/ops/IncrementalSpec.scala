package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for incremental (batch-vs-index) dedup and the iterative graph
  * operators, run on the driver's sf0.001 tables. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse_test")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("incremental exact: survivors are novel vs index and unique in batch") {
    import spark.implicits._
    val base = Seq((1L, "a b c"), (2L, "d e f")).toDF("id", "text")
    val batch = Seq(
      (10L, "c b a"),   // token-set dup of base doc 1 → dropped
      (11L, "x y z"),   // novel
      (12L, "z y x"),   // within-batch dup of 11 → dropped (11 first)
      (13L, "p q")      // novel
    ).toDF("id", "text")
    val idx = Incremental.fingerprintIndex(base, "text")
    val out = Incremental.dedupAgainstIndex(batch, idx, "id", "text")
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(11L, 13L))
  }

  test("incremental minhash finds the exact batch-vs-base pairs at sf0.001") {
    val approx = Incremental.queries("dedup_incr_minhash")(spark, sf)
      .select(col("id_batch"), col("id_base")).collect().toSet
    // exact anchor from the registered query
    val exact = Incremental.queries("dedup_incr_jaccard_exact")(spark, sf)
      .select(col("id_batch"), col("id_base")).collect().toSet
    assert(approx.subsetOf(exact), "LSH path must be precision-1.0")
    val recall = Incremental.queries("audit_incr_minhash_recall")(spark, sf)
      .head.getAs[Double]("recall")
    assert(recall >= 0.95, s"recall $recall below the audited floor")
  }

  test("pagerank: ranks sum to ~1 and hubs outrank leaves") {
    import spark.implicits._
    // star: hub h connected to 5 spokes + a detached pair
    val edges0 = (1 to 5).map(i => ("h", s"s$i")) :+ (("x", "y"))
    val edges = edges0.toDF("a", "b")
    val e = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
    val ranks = Graph.pageRank(e).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = ranks.values.sum
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass $total drifted")
    assert(ranks("h") > ranks("s1") * 3,
      "hub must dominate its spokes")
    assert(math.abs(ranks("x") - ranks("y")) < 1e-9,
      "symmetric pair must tie")
    assert(ranks("h") > ranks("x"), "hub must outrank detached pair")
  }

  test("data profile reports exact nulls and distincts") {
    import spark.implicits._
    val rows = Warehouse.queries("q_data_profile")(spark, sf).collect()
    assert(rows.length == 4)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val n = orders.count()
    assert(byCol("o_orderkey").getAs[Long]("n_rows") == n)
    assert(byCol("o_orderkey").getAs[Long]("n_distinct") == n)
    assert(byCol("o_orderkey").getAs[Long]("n_null") == 0L)
    assert(byCol("o_orderstatus").getAs[Long]("n_distinct") <= 3L)
  }
}
