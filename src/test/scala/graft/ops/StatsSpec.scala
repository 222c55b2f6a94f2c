package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the experimentation/statistics surface (the
  * oracle gate proves cross-engine equality; these prove the STATISTICS
  * are right — known-answer identities a wrong formula can't fake). */
class StatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse_test")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("welch t: identical arms give t = 0; known two-sample case matches R") {
    // identical arms via duplicating each value across both parities
    import spark.implicits._
    // +1001 flips user-id parity, so every value lands in BOTH arms
    val rows = (1 to 40).map(i => (i.toLong, "x", 5.0 + (i % 7)))
    val e = (rows ++ rows.map { case (id, t0, v) => (id + 1001, t0, v) })
      .map { case (id, t0, v) => (id, t0, v, (id % 2).toInt) }
      .toDF("user_id", "event_type", "value", "arm")
    val m = e.groupBy($"event_type", $"arm")
      .agg(count(lit(1)).as("n"), sum($"value").as("s1"),
        sum($"value" * $"value").as("s2"))
      .withColumn("mean", $"s1" / $"n")
      .withColumn("vr", ($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1))
      .orderBy($"arm").collect()
    assert(m(0).getAs[Double]("mean") == m(1).getAs[Double]("mean"))
    assert(math.abs(m(0).getAs[Double]("vr") - m(1).getAs[Double]("vr")) < 1e-9)
    // Welch on {1,2,3,4} vs {2,4,6,8,10}: va=5/3, vb=10, se2=29/12
    // → t = -3.5/sqrt(29/12) = -2.2514350, df = (29/12)²/(25/432 + 1)
    // = 5.5207876
    val a = Seq(1.0, 2.0, 3.0, 4.0); val b = Seq(2.0, 4.0, 6.0, 8.0, 10.0)
    def mv(x: Seq[Double]) = {
      val n = x.size; val m0 = x.sum / n
      (n, m0, x.map(v => (v - m0) * (v - m0)).sum / (n - 1))
    }
    val (na, ma, va) = mv(a); val (nb, mb, vb) = mv(b)
    val se2 = va / na + vb / nb
    val t0 = (ma - mb) / math.sqrt(se2)
    val df = se2 * se2 / (va * va / (na.toDouble * na * (na - 1)) +
      vb * vb / (nb.toDouble * nb * (nb - 1)))
    assert(math.abs(t0 - (-2.2514350)) < 1e-5)
    assert(math.abs(df - 5.5207876) < 1e-5)
  }

  test("acf: a strictly periodic series has acf ≈ 1 at its period") {
    import spark.implicits._
    // period-4 series over 64 hours, mean-varying: x_h = 10 + (h % 4) * 3
    val hourly = (0 until 64).map(h => (h.toLong, 10L + (h % 4) * 3))
      .toDF("h", "n")
    val base = hourly.agg(count(lit(1)).as("nh"), sum($"n").as("s"),
      sum($"n" * $"n").as("ss"))
    val lagged = hourly
      .select($"h", $"n", explode(sequence(lit(1), lit(4))).as("lag"))
      .join(hourly.select($"h".as("h2"), $"n".as("n2")),
        $"h2" === $"h" + $"lag")
      .groupBy($"lag")
      .agg(count(lit(1)).as("c_k"), sum($"n" * $"n2").as("sxy"),
        sum($"n").as("sx"), sum($"n2").as("sy"))
    val acf = lagged.crossJoin(base)
      .withColumn("mu", $"s".cast("double") / $"nh")
      .select($"lag", (($"sxy" - $"mu" * ($"sx" + $"sy") +
        $"c_k" * $"mu" * $"mu") /
        ($"ss".cast("double") - $"s".cast("double") * $"s" / $"nh")).as("acf"))
      .orderBy($"lag").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(acf(4) > 0.9, s"period-lag acf ${acf(4)}")
    assert(acf(2) < 0.0, s"anti-phase lag acf ${acf(2)}")
  }

  test("cusum: changepoint lands on a planted mean shift") {
    import spark.implicits._
    // 40 hours at 10/h then 40 hours at 30/h → argmax |S_k| at k=40
    val hourly = (0 until 80)
      .map(h => ("a", h.toLong, if (h < 40) 10L else 30L))
      .toDF("event_type", "hour_start", "n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"hour_start")
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    val scored = hourly
      .withColumn("k", row_number().over(w))
      .withColumn("cum", sum($"n").over(w))
      .withColumn("tot", sum($"n").over(wt))
      .withColumn("nh", count(lit(1)).over(wt))
      .withColumn("s_abs", abs($"cum".cast("double") -
        $"k" * $"tot".cast("double") / $"nh"))
    val top = scored.orderBy($"s_abs".desc, $"hour_start").head
    assert(top.getAs[Long]("hour_start") == 39L) // last pre-shift hour
    assert(top.getAs[Long]("cum") == 400L)
  }

  test("registered stats queries return sane shapes on sf0.001") {
    val corr = Stats.queries("q_corr_matrix")(spark, sf).collect()
    assert(corr.length == 6)
    corr.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr out of range: $r")
    }
    val t = Stats.queries("ab_welch_ttest")(spark, sf).collect()
    assert(t.nonEmpty)
    t.foreach(r => assert(!r.getAs[Double]("welch_df").isNaN))
    val chi = Stats.queries("ab_chi_square")(spark, sf).head
    assert(chi.getAs[Double]("chi2") >= 0.0)
    val acf = Stats.queries("events_acf_hourly")(spark, sf).collect()
    assert(acf.length == 12)
    acf.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-6 && a <= 1.0 + 1e-6, s"acf out of range: $r")
    }
  }
}
