package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** As-of join — an operator Spark lacks natively (SURVEY.md §4 listed it
  * as the canonical custom-operator candidate). For each left row, find
  * the latest right row with `rightTs <= leftTs` within the same key.
  *
  * Implementation: the union-and-carry technique — tag both sides, union
  * them, and per key carry the last right payload forward over the
  * timeline with `last(_, ignoreNulls)` ordered by (ts, side). This is
  * ONE shuffle + sort on (key), O(n log n), with no range cross-join and
  * no per-key state on the driver — the shape that survives 100 TB
  * (a range join would explode; a broadcast would not fit).
  * Right-side ties on (key, ts) must be pre-reduced by the caller to
  * keep the result deterministic.
  */
object AsOf {

  /** @param left     probe side
    * @param right    reference side (one row per (key, ts))
    * @param key      equi-join key column name (same name both sides)
    * @param leftTs   left ordering column
    * @param rightTs  right ordering column
    * @param carry    right columns to attach to left rows
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // side 0 sorts before side 1 at equal ts → a right row at exactly
    // leftTs is visible to that left row (<= semantics, ASOF default)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key).as("__k"), col("__ts"), col("__side")) ++
        lCols.map(c => col(c).as(s"__l_$c")) ++
        carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    require(carry.forall(c => !lCols.contains(c)),
      s"carry columns ${carry.filter(lCols.contains)} collide with left columns")
    val r = right
      // SQL semantics: a null key matches nothing, and a null rightTs
      // satisfies no `leftTs >= rightTs` predicate — neither may supply
      // carry values (null ts would sort first and be carried to every
      // left row)
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key).as("__k"), col("__ts"), col("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        carry.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select(Seq(col("__k"), col("__side")) ++
        lCols.map(c => col(s"__l_$c")) ++
        carry.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"__c_$c")): _*)
    carried.filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__l_$c").as(c)) ++
        carry.map(c => col(s"__c_$c").as(c)): _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // each event joined to the user's latest order at-or-before the
    // event time (oracle: DuckDB ASOF JOIN)
    "q_asof_join" -> { (s, dir) =>
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      // reduce right side to one row per (custkey, orderdate):
      // deterministic survivor = max orderkey
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
      join(ev, ord, "user_id", "ts", "o_orderdate",
        Seq("o_orderkey", "o_orderdate"))
        .orderBy(col("event_id"))
    },
    // FORWARD as-of (earliest right row at-or-after the probe) via the
    // same union-and-carry on negated time — no second implementation:
    // for each error event, the user's next purchase event
    "q_asof_forward" -> { (s, dir) =>
      val ev = events(s, dir)
      val probe = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("neg_us", -unix_micros(col("ts")))
      val ref = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
        .select(col("user_id"), col("purchase_id"),
          (-unix_micros(col("ts"))).as("r_neg_us"),
          col("ts").as("purchase_ts"))
      join(probe, ref, "user_id", "neg_us", "r_neg_us",
        Seq("purchase_id", "purchase_ts"))
        .select(col("event_id"), col("user_id"), col("purchase_id"),
          col("purchase_ts"))
        .orderBy(col("event_id"))
    },
    // NEAREST as-of (sensor-alignment semantics: closest reference in
    // EITHER direction, ties to the past) — composed from the same
    // union-and-carry primitive run backward then forward, so it stays
    // two sorts on the key with no range join; the pick is per-row
    // arithmetic on the two carried timestamps
    "q_asof_nearest" -> { (s, dir) =>
      val ev = events(s, dir)
      val probe = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("neg_us", -col("us"))
      val ref = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("pid"))
        .select(col("user_id"), col("pid"), unix_micros(col("ts")).as("pus"))
      val back = join(probe,
        ref.select(col("user_id"), col("pid").as("b_id"),
          col("pus").as("b_us"), col("pus").as("r_us")),
        "user_id", "us", "r_us", Seq("b_id", "b_us"))
      val both = join(back,
        ref.select(col("user_id"), col("pid").as("f_id"),
          col("pus").as("f_us"), (-col("pus")).as("r_neg_us")),
        "user_id", "neg_us", "r_neg_us", Seq("f_id", "f_us"))
      val dtB = col("us") - col("b_us")
      val dtF = col("f_us") - col("us")
      val pickBack = col("b_id").isNotNull &&
        (col("f_id").isNull || dtB <= dtF)
      both
        .withColumn("purchase_id",
          when(pickBack, col("b_id")).otherwise(col("f_id")))
        .withColumn("direction",
          when(col("purchase_id").isNull, lit(null).cast(StringType))
            .when(pickBack, lit("backward")).otherwise(lit("forward")))
        .withColumn("delta_us", when(pickBack, dtB).otherwise(dtF))
        .select(col("event_id"), col("user_id"), col("purchase_id"),
          col("direction"), col("delta_us"))
        .orderBy(col("event_id"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH ord AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |    max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin,
    // µs comparisons on both engines (epoch_us truncates exactly like
    // the Spark-side ns→µs event surface)
    "q_asof_forward" ->
      """WITH p AS (
        |  SELECT user_id, ts AS purchase_ts, epoch_us(ts) AS us,
        |    max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3),
        |e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us
        |  FROM events WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id, p.purchase_id, p.purchase_ts
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.us <= p.us
        |ORDER BY event_id""".stripMargin,
    "q_asof_nearest" ->
      """WITH probe AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us
        |  FROM events WHERE event_type = 'error'),
        |ref AS (
        |  SELECT user_id, epoch_us(ts) AS pus, max(event_id) AS pid
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |cand AS (
        |  SELECT p.event_id, r.pid, abs(p.us - r.pus) AS adt,
        |    CASE WHEN r.pus <= p.us THEN 0 ELSE 1 END AS fwd
        |  FROM probe p JOIN ref r USING (user_id)),
        |best AS (
        |  SELECT event_id, pid, adt, fwd,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY adt, fwd) AS rk
        |  FROM cand)
        |SELECT p.event_id, p.user_id, b.pid AS purchase_id,
        |  CASE WHEN b.pid IS NULL THEN NULL
        |       WHEN b.fwd = 0 THEN 'backward' ELSE 'forward' END
        |    AS direction,
        |  b.adt AS delta_us
        |FROM probe p LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
        |  USING (event_id)
        |ORDER BY event_id""".stripMargin
  )
}
