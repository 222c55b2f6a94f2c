package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Second wave of relational coverage (SURVEY.md §2c): the remaining
  * TPC-H query shapes adapted to the driver's simplified star schema,
  * plus scalar-function families (array/conditional/bitwise/date
  * arithmetic), window frame variants (lead/lag-k/first/last/nth),
  * moment statistics, unpivot, non-equi range joins and subquery
  * forms not already exercised by [[Relational]].
  *
  * Scale notes (100 TB stance):
  *  - every dimension side is `broadcast(...)`; fact-fact joins
  *    shuffle on their join keys and lean on AQE for skew;
  *  - disjunctive predicates (q19) stay in one scan-side filter so
  *    they reach the parquet reader as one pushed OR;
  *  - the range/band join broadcasts the tiny band dimension → a
  *    BroadcastNestedLoopJoin whose inner side is 25 rows. For a
  *    band table too big to broadcast, the contiguous-band shape
  *    reduces to an equi-join on `floor((x-lo)/width)` — noted here
  *    so the scale path is explicit;
  *  - "having" aggregates (q18) pre-aggregate the fact table on its
  *    own key BEFORE joining back (semi-join by aggregation result),
  *    so the join input is already one row per order.
  */
object Relational2 {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q4: EXISTS with a cross-side interval predicate (orders
    // with any line shipped > 60 days after the order date)
    "q4_order_priority" -> { (s, dir) =>
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1997-07-01").cast(TimestampType))
        .join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q13: distribution of orders-per-customer (double aggregation
    // over a left join that must preserve order-less customers)
    "q13_custdist" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q15: supplier(s) achieving the maximum quarterly revenue —
    // the max arrives as a broadcast scalar; equality is exact because
    // both revenues come from the same decimal-sum arithmetic
    "q15_top_supplier" -> { (s, dir) =>
      val revBySupp = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-04-01").cast(TimestampType))
        .groupBy(col("l_suppkey"))
        .agg(dsum(rev).as("total_rev"))
      val maxRev = revBySupp.agg(max(col("total_rev")).as("mr"))
      t(s, dir, "supplier")
        .join(revBySupp, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(maxRev))
        .filter(col("total_rev") === col("mr"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q17: correlated per-part average quantity threshold
    "q17_small_qty" -> { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q17")
      t(s, dir, "part").createOrReplaceTempView("part_q17")
      s.sql("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / 7.0 AS avg_yearly,
               count(*) AS n
        FROM lineitem_q17 JOIN part_q17 ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem_q17 l2
                            WHERE l2.l_partkey = p_partkey)""")
    },

    // TPC-H Q7: volume shipped between a nation pair, by year —
    // disjunctive cross-side predicate that cannot be fully pushed
    "q7_nation_volume" -> { (s, dir) =>
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8: one nation's market share inside one region, by year —
    // conditional-sum ratio with the division done in DOUBLE
    "q8_market_share" -> { (s, dir) =>
      val asiaCust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(dsum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0.0)))
          .as("nation_vol"),
          dsum(rev).as("total_vol"))
        .select(col("o_year"),
          round(col("nation_vol") / col("total_vol"), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q9: profit on a part-name pattern, by supplier nation × year
    "q9_product_profit" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_name").like("%red%"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(dsum(rev).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q10: top-20 customers by returned-item revenue in a quarter
    "q10_returned_items" -> { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1997-04-01").cast(TimestampType)),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q12 shape: order-priority mix per lineitem quantity class
    "q12_quantity_priority" -> { (s, dir) =>
      val qclass = when(col("l_quantity") < 10, "low")
        .when(col("l_quantity") < 30, "mid").otherwise("high")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(qclass.as("qclass"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("low_line_count"))
        .orderBy(col("qclass"))
    },

    // TPC-H Q14: promo revenue share per month of one ship-year
    "q14_promo_effect" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(month(col("l_shipdate")).as("l_month"))
        .agg(dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
          .as("promo_rev"),
          dsum(rev).as("total_rev"))
        .select(col("l_month"),
          round(lit(100.0) * col("promo_rev") / col("total_rev"), 6)
            .as("promo_share"))
        .orderBy(col("l_month"))
    },

    // TPC-H Q16 shape: distinct supplier count per (brand, type, size),
    // excluding a supplier blacklist via left-anti join (NOT IN)
    "q16_supplier_cnt" -> { (s, dir) =>
      val excluded = t(s, dir, "supplier").filter(col("s_acctbal") < 2000)
        .select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t(s, dir, "part").filter(col("p_brand") =!= "Brand#1")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // TPC-H Q18: large orders (HAVING sum(qty) > 300) joined back to
    // orders+customer; the fact table is pre-aggregated on its own key
    // before the join so the join input is one row per order
    "q18_large_orders" -> { (s, dir) =>
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },

    // TPC-H Q19: disjunction of conjunctive brand/size/quantity ranges —
    // one OR filter over the joined scan (pushable as a single predicate)
    "q19_disjunctive" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) &&
            col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) &&
            col("p_size").between(1, 25)) ||
          (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30) &&
            col("p_size").between(1, 35)))
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n"))
    },

    // TPC-H Q22 shape: above-average-balance customers with no
    // high-value orders, grouped by a name-derived code. The global
    // average arrives as a broadcast scalar (cross join of a 1-row DF).
    "q22_idle_balance" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      // threshold via dsum/count, not raw avg: double summation order
      // would make the scalar differ in the last ulps across engines
      val avgPos = cust.filter(col("c_acctbal") > 0)
        .agg((dsum(col("c_acctbal")) / count(col("c_acctbal"))).as("avg_bal"))
      val bigBuyers = t(s, dir, "orders")
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgPos))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(bigBuyers, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(substring(col("c_name"), 17, 2).as("code"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("code"))
    },

    // non-equi range join: customers matched to contiguous acctbal bands
    // derived from the nation dim (broadcast nested-loop join; a huge
    // band table would instead use the floor((x-lo)/width) equi-join)
    "q_range_band_join" -> { (s, dir) =>
      val bands = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("band"),
          (col("n_nationkey") * 400 - 1000).cast(DoubleType).as("lo"),
          ((col("n_nationkey") + 1) * 400 - 1000).cast(DoubleType).as("hi")))
      t(s, dir, "customer")
        .join(bands, col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("band_bal"))
        .orderBy(col("band"))
    },

    // generator: posexplode of tokenized part names (pos + value)
    "q_posexplode_tokens" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .toDF("p_partkey", "pos", "w")
        .orderBy(col("p_partkey"), col("pos"))
    },

    // array function family over tokenized names + generated sequences
    "q_array_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .withColumn("ws", split(col("p_name"), " "))
        .select(col("p_partkey"),
          size(col("ws")).as("n_words"),
          array_join(array_sort(col("ws")), ",").as("words_sorted"),
          element_at(col("ws"), 1).as("first_word"),
          array_position(col("ws"), "widget").cast(IntegerType).as("widget_pos"),
          array_contains(col("ws"), "bolt").as("has_bolt"),
          array_max(sequence(lit(1), pmod(col("p_size"), lit(5)) + 1))
            .as("seq_max"))
        .orderBy(col("p_partkey"))
    },

    // array set algebra: intersect / except / overlap / union
    "q_array_setops" -> { (s, dir) =>
      val hw = array(lit("small"), lit("red"), lit("widget"))
      t(s, dir, "part")
        .withColumn("ws", split(col("p_name"), " "))
        .select(col("p_partkey"),
          array_join(array_sort(array_intersect(col("ws"), hw)), ",")
            .as("inter"),
          array_join(array_sort(array_except(col("ws"), hw)), ",")
            .as("minus"),
          arrays_overlap(col("ws"), array(lit("bolt"), lit("gear")))
            .as("overlaps_hw"),
          array_join(array_sort(array_union(col("ws"), array(lit("extra")))), ",")
            .as("uni"))
        .orderBy(col("p_partkey"))
    },

    // conditional scalar family: nullif / coalesce / greatest / least / CASE
    "q_conditional_funcs" -> { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("AUTOMOBILE")), lit("OTHER"))
            .as("seg"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
          least(col("c_acctbal"), lit(0.0)).as("bal_neg"),
          when(col("c_acctbal") < 0, "debt")
            .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("band"))
        .orderBy(col("c_custkey"))
    },

    // window frame variants: lead/lag-k, first/last/nth over full frames
    "q_window_lead_frames" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          lag(col("o_totalprice"), 2).over(w).as("prev2_price"),
          first(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_price"),
          last(col("o_totalprice")).over(full).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // bitwise scalar family
    "q_bitwise" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_partkey").bitwiseAND(lit(255)).as("band_"),
          col("p_partkey").bitwiseOR(lit(4096)).as("bor"),
          col("p_partkey").bitwiseXOR(lit(9223)).as("bxor"),
          shiftleft(col("p_partkey"), 2).as("shl"),
          shiftright(col("p_partkey"), 1).as("shr"),
          bit_count(col("p_partkey")).as("bc"))
        .orderBy(col("p_partkey"))
    },

    // date arithmetic family: add days/months, month boundaries, diffs
    "q_date_arith" -> { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("d", to_date(col("o_orderdate")))
        .select(col("o_orderkey"),
          date_add(col("d"), 30).as("d30"),
          add_months(col("d"), 2).as("m2"),
          last_day(col("d")).as("ld"),
          trunc(col("d"), "month").as("mo"),
          datediff(col("d"), lit("2000-01-01").cast(DateType)).as("dd"))
        .orderBy(col("o_orderkey"))
    },

    // moment statistics: stddev/variance/corr/covar (rounded so the
    // double summation-order jitter cannot flip a digit)
    "q_stats_agg" -> { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          round(stddev_samp(col("c_acctbal")), 4).as("sd"),
          round(var_pop(col("c_acctbal")), 2).as("vp"),
          round(corr(col("c_acctbal"), col("c_custkey").cast(DoubleType)), 6)
            .as("cor"),
          round(covar_samp(col("c_acctbal"), col("c_custkey").cast(DoubleType)), 2)
            .as("cov"),
          count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    },

    // unpivot (wide → long) of conditional-aggregate counts
    "q_unpivot" -> { (s, dir) =>
      val wide = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
            .as("urgent"),
          sum(when(col("o_orderpriority") === "2-HIGH", 1).otherwise(0))
            .as("high"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("other"))
      wide.unpivot(Array(col("o_orderstatus")),
          Array(col("urgent"), col("high"), col("other")), "prio_class", "n")
        .orderBy(col("o_orderstatus"), col("prio_class"))
    },

    // timestamp component extraction
    "q_ts_extract" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"),
          dayofmonth(col("ts")).as("d"),
          month(col("ts")).as("mo"),
          year(col("ts")).as("y"))
        .orderBy(col("event_id"))
    },

    // map construction from JSON + map function family
    "q_map_json_funcs" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
        .select(col("event_id"),
          size(col("m")).as("n_keys"),
          concat_ws(",", map_keys(col("m"))).as("keys"),
          element_at(col("m"), "k").as("k_val"),
          map_contains_key(col("m"), "z").as("has_z"))
        .orderBy(col("event_id"))
    },

    // second string family: pad/repeat/slice/search/translate/case-ops
    "q_string_funcs2" -> { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("b_lpad"),
          rpad(col("p_brand"), 12, "-").as("b_rpad"),
          repeat(substring(col("p_type"), 1, 2), 3).as("t_rep"),
          expr("left(p_name, 4)").as("n_left"),
          expr("right(p_name, 4)").as("n_right"),
          instr(col("p_name"), "e").as("pos_e"),
          expr("split_part(p_type, 'O', 1)").as("t_part"),
          translate(col("p_brand"), "#", "_").as("b_tr"),
          ascii(col("p_name")).as("n_ascii"),
          expr("chr(65 + pmod(p_size, 26))").as("s_chr"),
          col("p_name").contains("red").as("has_red"),
          col("p_name").startsWith("sm").as("sm_start"),
          col("p_name").endsWith("et").as("et_end"))
        .orderBy(col("p_partkey"))
    },

    // boolean / conditional-count aggregates
    "q_bool_aggs" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_high_disc"),
          count_if(col("l_tax") === 0).as("n_no_tax"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // arg-min/arg-max aggregates (deterministic: ordering key is unique)
    "q_argminmax" -> { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          max_by(col("c_name"), col("c_custkey")).as("last_cust"),
          min_by(col("c_name"), col("c_custkey")).as("first_cust"),
          count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    },

    // custom whole-operator path: TopKPerKey LogicalPlan + Strategy +
    // partial/final physical exec — same answer as the window
    // formulation, but the shuffle carries <= k rows per key per
    // input partition instead of every row
    "q_topk_custom" -> { (s, dir) =>
      graft.plans.TopK.perKey(t(s, dir, "orders"),
          Seq("o_custkey"),
          Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // JSON build → path-extract roundtrip (to_json of nested structs)
    "q_json_roundtrip" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          get_json_object(
            to_json(struct(struct(col("o_orderkey").as("b")).as("a"))),
            "$.a.b").cast(LongType).as("extracted"))
        .orderBy(col("o_orderkey"))
    },

    // gaps-and-islands: runs of >= 3 consecutive same-type events per
    // user via the row_number-difference grouping trick
    "q_gaps_islands" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("grp",
          row_number().over(wAll) - row_number().over(wType))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(count(lit(1)).as("run_len"), min(col("event_id")).as("first_id"))
        .filter(col("run_len") >= 3)
        .select(col("user_id"), col("event_type"), col("run_len"),
          col("first_id"))
        .orderBy(col("user_id"), col("first_id"))
    },

    // forward fill (last-non-null imputation): carry each user's most
    // recent view value onto later events — per-row window carry, no
    // aggregation, so doubles compare exactly
    "q_forward_fill" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("v", when(col("event_type") === "view", col("value")))
        .select(col("event_id"), col("user_id"),
          last(col("v"), ignoreNulls = true).over(w).as("last_view_value"))
        .orderBy(col("event_id"))
    },

    // ntile bucketing: decile of order value within status (unique
    // tiebreak makes the bucket assignment engine-independent)
    "q_window_ntile" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(10).over(w).as("decile"))
        .orderBy(col("o_orderkey"))
    },

    // relative-rank windows: percent_rank / cume_dist (the quantile
    // normalization of a feature column). The ordering includes the
    // unique key, so there are no rank ties and both engines compute
    // identical (k-1)/(n-1) and k/n doubles.
    "q_window_percent_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("o_orderkey"))
    },

    // merge/upsert semantics via full-outer coalesce (the Delta-style
    // MERGE shape on plain tables): updates win over base, inserts
    // survive, untouched rows carry through — one shuffle on the key
    "q_merge_upsert" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val updates = base.filter(col("k") % 100 === 0)
        .select(col("k"), (col("price") * 2).as("price"))
      val inserts = base.filter(col("k") % 100 === 1)
        .select((col("k") + 100000000L).as("k"), col("price"))
      val delta = updates.union(inserts)
        .select(col("k").as("uk"), col("price").as("uprice"))
      base.join(delta, col("k") === col("uk"), "full_outer")
        .select(coalesce(col("k"), col("uk")).as("k"),
          coalesce(col("uprice"), col("price")).as("price"))
        .orderBy(col("k"))
    },

    // per-aggregate FILTER clauses (SQL-standard conditional aggregation)
    "q_agg_filter_clause" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_fc")
      s.sql("""
        SELECT o_orderstatus,
          count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
            AS urgent_total,
          count(*) AS n
        FROM orders_fc GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },

    // linear-regression aggregate family (rounded: moment sums in
    // double differ in final ulps across partitionings)
    "q_regr_aggs" -> { (s, dir) =>
      val x = col("c_custkey").cast(DoubleType)
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          round(regr_slope(col("c_acctbal"), x), 6).as("sl"),
          round(regr_intercept(col("c_acctbal"), x), 2).as("ic"),
          round(regr_r2(col("c_acctbal"), x), 6).as("r2"),
          regr_count(col("c_acctbal"), x).as("n"))
        .orderBy(col("c_mktsegment"))
    },

    // rollup with GROUPING() markers distinguishing real NULLs from
    // subtotal rows
    "q_grouping_id" -> { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        // grouping() is only resolvable inside the rollup aggregate
        .agg(grouping(col("o_orderstatus")).cast(IntegerType).as("g1"),
          grouping(col("o_orderpriority")).cast(IntegerType).as("g2"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // correlated scalar subquery in the PROJECTION (decorrelates to a
    // left outer aggregate join — different path from WHERE subqueries)
    "q_select_scalar_subquery" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer_ss")
      t(s, dir, "orders").createOrReplaceTempView("orders_ss")
      s.sql("""
        SELECT c_custkey,
          (SELECT count(*) FROM orders_ss WHERE o_custkey = c_custkey)
            AS n_orders,
          (SELECT max(o_totalprice) FROM orders_ss
           WHERE o_custkey = c_custkey) AS max_price
        FROM customer_ss ORDER BY c_custkey""")
    },

    // uncorrelated scalar subquery + IN subquery (SQL-path planning)
    "q_scalar_in_subquery" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_r2")
      t(s, dir, "customer").createOrReplaceTempView("customer_r2")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_r2
        WHERE o_totalprice > (
            SELECT 1.5 * CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                       / count(o_totalprice)
            FROM orders_r2)
          AND o_custkey IN (SELECT c_custkey FROM customer_r2
                            WHERE c_mktsegment = 'BUILDING')
        ORDER BY o_orderkey""")
    },

    // TPC-H Q11 adapted (no partsupp table in this schema): important
    // supplier-part value concentrations — (supp, part) groups whose
    // revenue exceeds k× the average group value within a nation set.
    // The scalar threshold is a FRACTION OF THE AVERAGE, not a fixed
    // constant, so the query stays non-degenerate at every SF (TPC-H's
    // own FRACTION scales with SF for the same reason). One agg over
    // the fact table (supplier dim broadcast), the scalar arrives as a
    // broadcast single row; average via the decimal sum.
    "q11_important_value" -> { (s, dir) =>
      val suppNat = broadcast(t(s, dir, "supplier")
        .filter(col("s_nationkey").isin(3, 7, 11))
        .select(col("s_suppkey")))
      val value = t(s, dir, "lineitem")
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(dsum(rev).as("v"))
      val thr = value.agg((lit(3.0) * dsum(col("v")) / count(lit(1)))
        .as("thr"))
      value.crossJoin(broadcast(thr))
        .filter(col("v") > col("thr"))
        .select(col("l_suppkey"), col("l_partkey"), round(col("v"), 6)
          .as("group_value"))
        .orderBy(col("l_suppkey"), col("l_partkey"))
    },

    // TPC-H Q20 adapted: suppliers with EXCESS shipments of PROMO-type
    // parts in 1996 — the nested IN (parts filter) → GROUP/HAVING
    // (quantity threshold) → semi-join (suppliers) chain. The HAVING
    // threshold is again average-relative (TPC-H's 0.5·availqty stand-
    // in), so it binds at every SF. Part dim broadcast into the scan;
    // the supplier probe is a left-semi join against the already-
    // aggregated (supp, part) frame — nothing after the first agg is
    // data-sized.
    "q20_excess_supplier" -> { (s, dir) =>
      val promo = broadcast(t(s, dir, "part")
        .filter(col("p_type") === "PROMO").select(col("p_partkey")))
      val shipped = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
        .join(promo, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("qty"))
      val thr = shipped.agg((lit(2.0) * dsum(col("qty")) / count(lit(1)))
        .as("thr"))
      // the excess key set is supplier-bounded (a dimension) — always
      // broadcastable; statically the planner can't know that and
      // would SMJ the semi-join
      val excess = shipped.crossJoin(broadcast(thr))
        .filter(col("qty") > col("thr")).select(col("l_suppkey"))
      t(s, dir, "supplier")
        .filter(col("s_nationkey") < 13)
        .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q21 adapted (no commit/receipt dates): suppliers who kept
    // finished orders waiting — lines shipped > 45 days after the order
    // date, in multi-supplier orders where theirs was the ONLY late
    // supplier. The EXISTS/NOT-EXISTS double correlation collapses to
    // per-(order, supplier) flags + a per-order count — one extra
    // colocated agg instead of two correlated fact-table probes (the
    // oracle keeps the textbook EXISTS form, proving the two plans
    // agree). Both aggs shuffle on orderkey — the second reuses the
    // first's partitioning.
    "q21_waiting_supplier" -> { (s, dir) =>
      val lo = t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 45 DAYS")).cast(IntegerType).as("late"))
      val perOS = lo.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("supp_late"),
          sum(col("late")).as("n_late_lines"))
      val perO = perOS.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(col("supp_late")).as("n_late_supp"))
      perOS.join(perO, Seq("l_orderkey"))
        .filter(col("supp_late") === 1 && col("n_supp") >= 2 &&
          col("n_late_supp") === 1)
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_late_lines")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // 2-D Pareto frontier (skyline): parts minimizing retail price
    // while maximizing size — no other part is cheaper-and-bigger.
    // The naive skyline is O(n²); here the data first collapses onto
    // the PRICE GRID (1-dp prices → ≤ |grid| rows independent of part
    // count), the frontier test is one running-max window over the
    // grid frame (RANGE .. 1 PRECEDING so equal-priced parts never
    // dominate each other), and the winners join back by grid key.
    // At 100 TB the grid agg is the only data pass; the window runs
    // over a metadata-sized frame.
    "q_pareto_frontier" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val grid = part
        .groupBy(round(col("p_retailprice") * 10).cast(LongType)
          .as("deci"))
        .agg(max(col("p_size")).as("msize"))
      val wCheaper = Window.orderBy(col("deci"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val frontier = grid.withColumn("best_cheaper",
        coalesce(max(col("msize")).over(wCheaper), lit(-1)))
      part
        .withColumn("deci", round(col("p_retailprice") * 10)
          .cast(LongType))
        .join(broadcast(frontier), Seq("deci"))
        .filter(col("p_size") === col("msize") &&
          col("p_size") > col("best_cheaper"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |         / 7.0 AS avg_yearly,
        |       count(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(sum(CAST(CASE WHEN sn.n_name = 'NATION_3'
        |      THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END
        |      AS DECIMAL(18,6))) AS DOUBLE) AS nation_vol,
        |    CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_vol
        |  FROM lineitem
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation cn ON c_nationkey = cn.n_nationkey
        |    JOIN region ON cn.n_regionkey = r_regionkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY 1)
        |SELECT o_year, round(nation_vol / total_vol, 6) AS mkt_share
        |FROM vol ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS profit
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q12_quantity_priority" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qclass,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_promo_effect" ->
      """WITH m AS (
        |  SELECT month(l_shipdate) AS l_month,
        |    CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END
        |      AS DECIMAL(18,6))) AS DOUBLE) AS promo_rev,
        |    CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1)
        |SELECT l_month, round(100.0 * promo_rev / total_rev, 6) AS promo_share
        |FROM m ORDER BY l_month""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 2000)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM orders
        |  JOIN big ON o_orderkey = l_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q19_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
        |       AND p_size BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
        |       AND p_size BETWEEN 1 AND 25)
        |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
        |       AND p_size BETWEEN 1 AND 35)""".stripMargin,
    "q22_idle_balance" ->
      """SELECT substring(c_name, 17, 2) AS code, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |                            / count(c_acctbal)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000)
        |GROUP BY 1 ORDER BY code""".stripMargin,
    "q_range_band_join" ->
      """SELECT n_nationkey AS band, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS band_bal
        |FROM nation JOIN customer
        |  ON c_acctbal >= n_nationkey*400 - 1000
        | AND c_acctbal < (n_nationkey+1)*400 - 1000
        |GROUP BY 1 ORDER BY band""".stripMargin,
    "q_posexplode_tokens" ->
      """SELECT p_partkey, u.pos AS pos, u.w AS w FROM (
        |  SELECT p_partkey,
        |    unnest(list_transform(range(1, len(ws)+1),
        |      i -> {'pos': i-1, 'w': ws[i]})) AS u
        |  FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part))
        |ORDER BY p_partkey, pos""".stripMargin,
    "q_array_funcs" ->
      """SELECT p_partkey,
        |  len(ws) AS n_words,
        |  array_to_string(list_sort(ws), ',') AS words_sorted,
        |  ws[1] AS first_word,
        |  coalesce(CAST(list_position(ws, 'widget') AS INT), 0) AS widget_pos,
        |  list_contains(ws, 'bolt') AS has_bolt,
        |  list_max(range(1, (p_size % 5) + 2)) AS seq_max
        |FROM (SELECT p_partkey, p_size, string_split(p_name, ' ') AS ws FROM part)
        |ORDER BY p_partkey""".stripMargin,
    // empty lists stringify to NULL in DuckDB but "" in Spark → coalesce
    "q_array_setops" ->
      """SELECT p_partkey,
        |  coalesce(array_to_string(list_sort(
        |    list_intersect(ws, ['small','red','widget'])), ','), '') AS inter,
        |  coalesce(array_to_string(list_sort(list_filter(ws,
        |    x -> NOT list_contains(['small','red','widget'], x))), ','), '')
        |    AS minus,
        |  list_has_any(ws, ['bolt','gear']) AS overlaps_hw,
        |  coalesce(array_to_string(list_sort(list_distinct(
        |    list_concat(ws, ['extra']))), ','), '') AS uni
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part)
        |ORDER BY p_partkey""".stripMargin,
    "q_conditional_funcs" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS seg,
        |  greatest(c_acctbal, 0.0) AS bal_pos,
        |  least(c_acctbal, 0.0) AS bal_neg,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_window_lead_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  lag(o_totalprice, 2) OVER w AS prev2_price,
        |  first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS first_price,
        |  last_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING) AS last_price,
        |  nth_value(o_totalprice, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING) AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_bitwise" ->
      """SELECT p_partkey,
        |  p_partkey & 255 AS band_,
        |  p_partkey | 4096 AS bor,
        |  xor(p_partkey, 9223) AS bxor,
        |  p_partkey << 2 AS shl,
        |  p_partkey >> 1 AS shr,
        |  CAST(bit_count(p_partkey) AS INT) AS bc
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS d30,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS m2,
        |  last_day(CAST(o_orderdate AS DATE)) AS ld,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
        |  CAST(date_diff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE)) AS INT) AS dd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_stats_agg" ->
      """SELECT c_mktsegment,
        |  round(stddev_samp(c_acctbal), 4) AS sd,
        |  round(var_pop(c_acctbal), 2) AS vp,
        |  round(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS cor,
        |  round(covar_samp(c_acctbal, CAST(c_custkey AS DOUBLE)), 2) AS cov,
        |  count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderstatus,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
        |    CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |    CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS other
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, 'urgent' AS prio_class, urgent AS n FROM wide
        |UNION ALL
        |SELECT o_orderstatus, 'high' AS prio_class, high AS n FROM wide
        |UNION ALL
        |SELECT o_orderstatus, 'other' AS prio_class, other AS n FROM wide
        |ORDER BY o_orderstatus, prio_class""".stripMargin,
    "q_ts_extract" ->
      """SELECT event_id, hour(ts) AS h, minute(ts) AS mi,
        |  CAST(second(ts) AS INT) AS sec, day(ts) AS d,
        |  month(ts) AS mo, year(ts) AS y
        |FROM events ORDER BY event_id""".stripMargin,
    "q_map_json_funcs" ->
      """SELECT event_id,
        |  len(json_keys(props)) AS n_keys,
        |  array_to_string(json_keys(props), ',') AS keys,
        |  CAST(props->>'$.k' AS INT) AS k_val,
        |  list_contains(json_keys(props), 'z') AS has_z
        |FROM events ORDER BY event_id""".stripMargin,
    "q_string_funcs2" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS b_lpad,
        |  rpad(p_brand, 12, '-') AS b_rpad,
        |  repeat(substring(p_type, 1, 2), 3) AS t_rep,
        |  left(p_name, 4) AS n_left,
        |  right(p_name, 4) AS n_right,
        |  strpos(p_name, 'e') AS pos_e,
        |  split_part(p_type, 'O', 1) AS t_part,
        |  translate(p_brand, '#', '_') AS b_tr,
        |  ascii(p_name) AS n_ascii,
        |  chr(65 + p_size % 26) AS s_chr,
        |  contains(p_name, 'red') AS has_red,
        |  starts_with(p_name, 'sm') AS sm_start,
        |  ends_with(p_name, 'et') AS et_end
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_bool_aggs" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.09) AS any_high_disc,
        |  count(*) FILTER (l_tax = 0) AS n_no_tax,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_argminmax" ->
      """SELECT c_mktsegment,
        |  arg_max(c_name, c_custkey) AS last_cust,
        |  arg_min(c_name, c_custkey) AS first_cust,
        |  count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_topk_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_json_roundtrip" ->
      """SELECT o_orderkey,
        |  CAST(to_json({'a': {'b': o_orderkey}})->>'$.a.b' AS BIGINT)
        |    AS extracted
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_gaps_islands" ->
      """WITH r AS (SELECT user_id, event_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) -
        |  row_number() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY ts, event_id) AS grp
        | FROM events)
        |SELECT user_id, event_type, count(*) AS run_len,
        |  min(event_id) AS first_id
        |FROM r GROUP BY user_id, event_type, grp
        |HAVING count(*) >= 3
        |ORDER BY user_id, first_id""".stripMargin,
    "q_forward_fill" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_view_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ntile(10) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_percent_rank" ->
      """SELECT o_orderkey, o_orderstatus,
        |  round(percent_rank() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey), 6) AS pr,
        |  round(cume_dist() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice, o_orderkey), 6) AS cd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
        |delta AS (
        |  SELECT k AS uk, price * 2 AS uprice FROM base WHERE k % 100 = 0
        |  UNION ALL
        |  SELECT k + 100000000 AS uk, price AS uprice FROM base
        |  WHERE k % 100 = 1)
        |SELECT coalesce(k, uk) AS k, coalesce(uprice, price) AS price
        |FROM base FULL OUTER JOIN delta ON k = uk
        |ORDER BY k""".stripMargin,
    "q_agg_filter_clause" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
        |       FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
        |    AS urgent_total,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_regr_aggs" ->
      """SELECT c_mktsegment,
        |  round(regr_slope(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS sl,
        |  round(regr_intercept(c_acctbal, CAST(c_custkey AS DOUBLE)), 2) AS ic,
        |  round(regr_r2(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS r2,
        |  CAST(regr_count(c_acctbal, CAST(c_custkey AS DOUBLE)) AS BIGINT) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g1,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g2,
        |  count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_select_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
        |    AS n_orders,
        |  (SELECT max(o_totalprice) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_price
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scalar_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (
        |    SELECT 1.5 * CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |               / count(o_totalprice)
        |    FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q11_important_value" ->
      """WITH val AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey IN (3, 7, 11)
        |  GROUP BY 1, 2)
        |SELECT l_suppkey, l_partkey, round(v, 6) AS group_value
        |FROM val
        |WHERE v > (SELECT 3.0 * CAST(sum(CAST(v AS DECIMAL(18,6)))
        |    AS DOUBLE) / count(*) FROM val)
        |ORDER BY l_suppkey, l_partkey""".stripMargin,
    "q20_excess_supplier" ->
      """WITH shipped AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |      AS qty
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_type = 'PROMO')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM shipped
        |    WHERE qty > (SELECT 2.0 * CAST(sum(CAST(qty
        |        AS DECIMAL(18,6))) AS DOUBLE) / count(*) FROM shipped))
        |  AND s_nationkey < 13
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  JOIN orders o2 ON l3.l_orderkey = o2.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o2.o_orderdate
        |                      + INTERVAL 45 DAY)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_pareto_frontier" ->
      """WITH g AS (
        |  SELECT CAST(round(p_retailprice * 10) AS BIGINT) AS deci,
        |         max(p_size) AS msize
        |  FROM part GROUP BY 1),
        |fr AS (
        |  SELECT deci, msize,
        |    coalesce(max(msize) OVER (ORDER BY deci
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |      AS best_cheaper
        |  FROM g)
        |SELECT p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p JOIN fr
        |  ON CAST(round(p.p_retailprice * 10) AS BIGINT) = fr.deci
        |WHERE p.p_size = fr.msize AND p.p_size > fr.best_cheaper
        |ORDER BY p.p_retailprice, p.p_partkey""".stripMargin
  )
}
