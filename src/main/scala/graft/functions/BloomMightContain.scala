package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a pre-built Bloom filter over LONG keys, with
  * codegen — the row-level runtime-filter building block for
  * [[graft.ops.Scale.bloomPrunedJoin]].
  *
  * The filter is built driver-side from the (small) dimension side and
  * ships to executors inside the serialized expression; at 100 TB this
  * prunes the fact scan BEFORE the join shuffle, which is exactly what
  * Spark's adaptive runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects — made
  * explicit here so the pruning is plannable and testable. False
  * positives only ever ADD candidate rows; the exact join that follows
  * removes them, so results are identical to the unpruned join.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires an integral key, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override def nullSafeEval(input: Any): Any = bloom.mightContainLong(asLong(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.mightContainLong((long) $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
