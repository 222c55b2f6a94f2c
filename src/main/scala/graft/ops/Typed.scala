package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Typed `Dataset[T]` surface (case-class Encoders, typed filters,
  * `KeyValueGroupedDataset` mapGroups/cogroup) — the API a type-safe
  * pipeline author uses.
  *
  * Scale note: `mapGroups`/`cogroup` shuffle ALL rows to their key's
  * task with no partial aggregation — correct for genuinely per-group
  * imperative logic (these two queries keep groups small by
  * construction), but a declarative `groupBy().agg()` is the right
  * shape when the computation is expressible as aggregates. That
  * trade-off is the point of exercising both here.
  */
object Typed {

  case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_totalprice: Double, o_orderstatus: String)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // typed filter + groupByKey + mapGroups (deterministic outputs:
    // count and min key, no float accumulation)
    "q_typed_dataset" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
        .as[OrderRow]
        .filter(_.o_totalprice > 100000)
        .groupByKey(_.o_orderstatus)
        .mapGroups { (k, it) =>
          var n = 0L
          var minKey = Long.MaxValue
          it.foreach { o => n += 1; if (o.o_orderkey < minKey) minKey = o.o_orderkey }
          (k, n, minKey)
        }
        .toDF("o_orderstatus", "n", "min_key")
        .orderBy(col("o_orderstatus"))
    },
    // typed cogroup: per-customer cardinality from both sides without a
    // join (keys from either input survive)
    "q_typed_cogroup" -> { (s, dir) =>
      import s.implicits._
      val cs = t(s, dir, "customer").select(col("c_custkey")).as[Long]
        .groupByKey(identity)
      val os = t(s, dir, "orders").select(col("o_custkey")).as[Long]
        .groupByKey(identity)
      cs.cogroup(os) { (k, a, b) =>
          Iterator((k, a.size.toLong, b.size.toLong))
        }
        .toDF("custkey", "n_cust", "n_ord")
        .orderBy(col("custkey"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_typed_dataset" ->
      """SELECT o_orderstatus, count(*) AS n, min(o_orderkey) AS min_key
        |FROM orders WHERE o_totalprice > 100000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_typed_cogroup" ->
      """WITH c AS (SELECT c_custkey AS k, count(*) AS n_cust
        |           FROM customer GROUP BY 1),
        |o AS (SELECT o_custkey AS k, count(*) AS n_ord
        |      FROM orders GROUP BY 1)
        |SELECT coalesce(c.k, o.k) AS custkey,
        |  coalesce(n_cust, 0) AS n_cust,
        |  coalesce(n_ord, 0) AS n_ord
        |FROM c FULL OUTER JOIN o ON c.k = o.k
        |ORDER BY custkey""".stripMargin
  )
}
