package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom path (SparkSessionExtensions preference (c) in
  * the design brief): top-k rows per key WITHOUT sorting or shuffling
  * the full input.
  *
  * The stock formulation — `row_number().over(Window.partitionBy(keys)
  * .orderBy(order)) <= k` — shuffles EVERY row to its key's reducer and
  * sorts whole partitions. This operator is the rank-query analogue of
  * partial aggregation: a map-side pass reduces each input partition to
  * at most k rows per key (bounded per-key heaps), the shuffle carries
  * only those survivors, and a final clustered pass re-selects the
  * exact top-k. At 100 TB with bounded key cardinality per partition
  * this turns the dominant shuffle from O(rows) into
  * O(keys·k·partitions).
  *
  * Exactness requires `order` to be a total order within each key
  * (append a unique tiebreaker, as the stock formulation also needs for
  * determinism). Memory is bounded by (distinct keys per partition) × k
  * rows — the same trade hash aggregation makes.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy: partial (any distribution) → exchange (inserted by
  * EnsureRequirements) → final (clustered on keys). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // max-heap by sort order: head = worst survivor, evicted when a
      // better row arrives
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val pq = heaps.get(key) match {
          case Some(q) => q
          case None =>
            val q = new mutable.PriorityQueue[InternalRow]()(ordering)
            heaps.update(key.copy(), q)
            q
        }
        if (pq.size < kk) pq.enqueue(row.copy())
        else if (ordering.compare(row, pq.head) < 0) {
          pq.dequeue(); pq.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Column-level API. */
object TopK {
  /** Top-k rows per `keys` by `order` — `(column, descending?)` pairs
    * that must totally order rows within a key for exact results.
    * Columns are resolved against the input's analyzed plan up front
    * (Spark 4 `Column`s carry unresolved ColumnNodes the analyzer only
    * resolves inside known node types). Idempotently installs
    * [[TopKStrategy]] on the session. */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val plan = GraftBridge.analyzed(df)
    // match Spark's session-configured resolution (case-insensitive by
    // default) rather than exact-name matching, so `perKey(df,
    // Seq("O_CUSTKEY"), …)` behaves like every other column reference
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String): Attribute = {
      val hits = plan.output.filter(a => resolver(a.name, n))
      if (hits.isEmpty) throw new IllegalArgumentException(
        s"no column $n in ${plan.output.map(_.name).mkString(", ")}")
      if (hits.size > 1) throw new IllegalArgumentException(
        s"ambiguous column $n: ${hits.map(_.name).mkString(", ")}")
      hits.head
    }
    val sortOrder = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftBridge.ofRows(spark,
      TopKPerKey(keys.map(attr), sortOrder, k, plan))
  }
}
