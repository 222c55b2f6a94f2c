package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Relational operator coverage (SURVEY.md §2c): every category the
  * reference lacks — joins (inner/outer/semi/anti/broadcast), hash
  * aggregation with partial/map-side combine, distinct aggregates,
  * rollup/cube/grouping sets, window functions, sorts/top-k, set
  * operations, scalar function families, correlated subqueries —
  * expressed as stock Spark so Catalyst owns the plan.
  *
  * Scale notes (100 TB stance):
  *  - dimension sides of star joins are explicitly `broadcast(...)`;
  *    fact-fact joins shuffle on their keys and rely on AQE for skew.
  *  - aggregations are declarative `groupBy.agg` → partial+final hash
  *    agg with map-side combine for free.
  *  - top-k is `orderBy.limit` → Spark's TakeOrderedAndProject (no
  *    global sort materialization).
  */
object Relational {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scan → filter → hash agg → sort (TPC-H Q1 shape)
    "q1_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // top-k: TakeOrderedAndProject, never a global sort
    "q2_topk_parts" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_retailprice"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
        .limit(10)
    },

    // broadcast dim join + shuffle fact join + agg + top-k (TPC-H Q3)
    "q3_shipping_priority" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast(TimestampType))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast(TimestampType))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // 6-table star join (TPC-H Q5 shape): dims broadcast, facts shuffle
    "q5_local_supplier_volume" -> { (s, dir) =>
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val supp = t(s, dir, "supplier")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // predicate-only scan+agg (TPC-H Q6 shape): every filter reaches
    // the parquet scan, no shuffle before the single-group agg
    "q6_forecast_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    },

    // RANGE window frame: trailing 1-hour moving aggregate per user
    "q_moving_window" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum(col("value").cast(DecimalType(18, 6))).over(w)
            .cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
        .orderBy(col("event_id"))
    },

    // left-semi join (EXISTS)
    "q_semi_join" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("2001-06-01").cast(TimestampType))
      t(s, dir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // left-anti join (NOT EXISTS)
    "q_anti_join" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // left outer join + agg preserving unmatched rows
    "q_outer_join_counts" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
        .orderBy(col("c_custkey"))
    },

    // window: rank per group + top-n (QUALIFY shape)
    "q_window_topn_orders" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // window: running sum + lag over an ordered event stream
    "q_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("running_value",
          dsumOver(col("value"), w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("prev_event_type",
          lag(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("running_value"),
          col("prev_event_type"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // window rank family: percent_rank / cume_dist / ntile
    "q_window_stats" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // rollup: hierarchical subtotals
    "q_rollup_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // share-of-parent hierarchy analytics: each nation's revenue share
    // within its region and each region's share of the total — the
    // drill-down companion to the rollup totals. One fact aggregate to
    // (region, nation) rows; both share windows run over the bounded
    // dimension grid, never data.
    "q_rollup_share" -> { (s, dir) =>
      val rev = t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
      val wReg = Window.partitionBy(col("r_name"))
      val wAll = Window.partitionBy()
      rev
        .withColumn("region_rev",
          sum(col("revenue").cast(DecimalType(28, 6))).over(wReg)
            .cast(DoubleType))
        .withColumn("total_rev",
          sum(col("revenue").cast(DecimalType(28, 6))).over(wAll)
            .cast(DoubleType))
        .select(col("r_name"), col("n_name"),
          round(col("revenue"), 2).as("revenue"),
          round(col("revenue") / col("region_rev"), 6)
            .as("share_of_region"),
          round(col("region_rev") / col("total_rev"), 6)
            .as("region_share_of_total"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // cube: all grouping combinations
    "q_cube_lineitem" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // set ops: UNION / INTERSECT / EXCEPT (all distinct-flavored)
    "q_set_ops" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val buyers = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
      val auto = cust.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("k"))
      val debt = cust.filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k"))
      buyers.intersect(auto).union(debt).distinct()
        .except(cust.filter(col("c_nationkey") === 3)
          .select(col("c_custkey").as("k")))
        .orderBy(col("k"))
    },

    // multiset set ops: INTERSECT ALL / EXCEPT ALL preserve duplicates
    "q_set_ops_all" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_quantity") <= 25).select(col("l_suppkey").as("k"))
      val b = li.filter(col("l_discount") > 0.03).select(col("l_suppkey").as("k"))
      a.intersectAll(b).exceptAll(
          li.filter(col("l_returnflag") === "R").select(col("l_suppkey").as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    },

    // lateral correlated subquery (per-customer top-2 orders)
    "q_lateral_topn" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer_lat")
      t(s, dir, "orders").createOrReplaceTempView("orders_lat")
      s.sql("""
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer_lat,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    },

    // array-building aggregates: collect_set + deterministic sort
    "q_collect_agg" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
          .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // distinct aggregates
    "q_distinct_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_orderkey")).as("n_ord"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // scalar string function family
    "q_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          lower(col("p_type")).as("type_lower"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), " ", "_").as("name_snake"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          trim(col("p_name")).as("name_trim"),
          reverse(col("p_brand")).as("brand_rev"))
        .orderBy(col("p_partkey"))
    },

    // scalar date function family + agg by derived keys
    "q_date_funcs" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("o_year"),
          quarter(col("o_orderdate")).as("o_quarter"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"),
          min(to_date(col("o_orderdate"))).as("first_day"),
          max(to_date(col("o_orderdate"))).as("last_day"))
        .orderBy(col("o_year"), col("o_quarter"))
    },

    // math + conditional family
    "q_math_case" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          dsum(abs(col("l_discount") - lit(0.05))).as("sum_abs_dev"),
          sum(floor(col("l_extendedprice")).cast(LongType)).as("sum_floor"),
          sum(ceil(col("l_extendedprice")).cast(LongType)).as("sum_ceil"),
          dsum(sqrt(col("l_quantity"))).as("sum_sqrt_qty"),
          dsum(pow(col("l_tax"), 2)).as("sum_tax_sq"),
          sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_high_disc"))
        .orderBy(col("l_linestatus"))
    },

    // correlated subquery (decorrelation exercised via SQL text)
    "q_correlated_subquery" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v o
        WHERE o_totalprice > (
          SELECT 2 * AVG(i.o_totalprice) FROM orders_v i
          WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },

    // grouping sets via SQL
    "q_grouping_sets" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST""")
    },

    // json extraction over the events props column
    "q_json_events" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_topk_parts" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_moving_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > TIMESTAMP '2001-06-01 00:00:00')
        |ORDER BY o_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_outer_join_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(sum(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,6))) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_window_topn_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value,
        |  lag(event_type, 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_type
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_window_stats" ->
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_rollup_share" ->
      """WITH rev AS (SELECT r_name, n_name,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |      AS revenue
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN orders ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |sh AS (SELECT *,
        |    CAST(sum(CAST(revenue AS DECIMAL(28,6)))
        |      OVER (PARTITION BY r_name) AS DOUBLE) AS region_rev,
        |    CAST(sum(CAST(revenue AS DECIMAL(28,6)))
        |      OVER () AS DOUBLE) AS total_rev
        |  FROM rev)
        |SELECT r_name, n_name, round(revenue, 2) AS revenue,
        |  round(revenue / region_rev, 6) AS share_of_region,
        |  round(region_rev / total_rev, 6) AS region_share_of_total
        |FROM sh ORDER BY r_name, n_name""".stripMargin,
    "q_cube_lineitem" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_set_ops" ->
      """SELECT k FROM (
        |  SELECT k FROM (
        |    SELECT o_custkey AS k FROM orders
        |    INTERSECT
        |    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |    UNION
        |    SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0)
        |  EXCEPT
        |  SELECT c_custkey AS k FROM customer WHERE c_nationkey = 3)
        |ORDER BY k""".stripMargin,
    "q_set_ops_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT k FROM (
        |    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity <= 25
        |    INTERSECT ALL
        |    SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.03)
        |  EXCEPT ALL
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY k ORDER BY k""".stripMargin,
    "q_lateral_topn" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_collect_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
        |    AS statuses,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(DISTINCT l_orderkey) AS n_ord,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  lower(p_type) AS type_lower,
        |  length(p_name) AS name_len,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  regexp_extract(p_name, '(\w+)$', 1) AS last_word,
        |  regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  trim(p_name) AS name_trim,
        |  reverse(p_brand) AS brand_rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT year(o_orderdate) AS o_year, quarter(o_orderdate) AS o_quarter,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |  min(CAST(o_orderdate AS DATE)) AS first_day,
        |  max(CAST(o_orderdate AS DATE)) AS last_day
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_math_case" ->
      """SELECT l_linestatus,
        |  CAST(sum(CAST(abs(l_discount - 0.05) AS DECIMAL(18,6))) AS DOUBLE) AS sum_abs_dev,
        |  CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_floor,
        |  CAST(sum(CAST(ceil(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_ceil,
        |  CAST(sum(CAST(sqrt(l_quantity) AS DECIMAL(18,6))) AS DOUBLE) AS sum_sqrt_qty,
        |  CAST(sum(CAST(pow(l_tax, 2) AS DECIMAL(18,6))) AS DOUBLE) AS sum_tax_sq,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT 2 * AVG(i.o_totalprice) FROM orders i
        |  WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_json_events" ->
      """SELECT CAST(props->>'$.k' AS INT) AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
