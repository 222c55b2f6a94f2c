package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for graft's custom Catalyst expressions.
  * `ExpressionUtils` is `private[sql]` in Spark 4, so the conversion has
  * to be exposed from inside the package — this is the only file outside
  * the `graft` namespace. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`): the entry point for whole-operator custom nodes
    * like graft.plans.TopKPerKey. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed plan of a DataFrame (for wrapping in custom nodes). */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Free the storage blocks behind a `localCheckpoint()`ed DataFrame.
    * localCheckpoint materializes to a persisted internal RDD wrapped in
    * a `LogicalRDD`, but exposes no way to release it — iterative
    * operators that checkpoint per round (kCore peeling) would
    * otherwise pin every round's blocks until the context cleaner
    * eventually notices (gigabytes at the 3× scale probe). No-op for
    * non-checkpoint plans. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Block until every queued SparkListener event has been delivered
    * (`listenerBus` is `private[spark]`). Task-end metrics arrive on
    * the async bus; a telemetry snapshot taken without draining it can
    * attribute one query's shuffle/spill bytes to the next. */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register a custom expression under a SQL-callable name
    * (`sessionState` is also `private[sql]`). Idempotent. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
