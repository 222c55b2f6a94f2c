package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Karp–Rabin) rolling hash of a string's UTF-8 bytes:
  * `h ← (h·31 + byte) mod 1e9+7`, single codegen'd pass. The modulus
  * keeps every intermediate in BIGINT range so the DuckDB oracle can
  * reproduce it with a `list_reduce` fold — unlike an overflowing
  * 64-bit hash, which DuckDB's checked arithmetic rejects. This is the
  * streaming-friendly fingerprint (extendable chunk-by-chunk, the same
  * recurrence a content-defined-chunking dedup pass uses), complementing
  * the order-insensitive md5 token fingerprint in
  * [[graft.ops.Text.fingerprint]]. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash requires a string input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RollingHash.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 1000000007L

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    h
  }
}
