package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-wide MinHash signature of a string-shingle set in ONE per-row
  * pass — no explode, no shuffle, no aggregation.
  *
  * Each shingle is hashed once (FNV-1a 64 over its UTF-8 bytes); the K
  * hash functions are derived from that one value by splitmix64
  * finalization of `h + i·GOLDEN` (standard universal-hashing MinHash
  * practice). The earlier formulation exploded shingles and ran K
  * `min(xxhash64(shingle, i))` aggregates — K full string hashes per
  * shingle plus a groupBy shuffle; per-row computation removes the
  * shuffle from signature generation entirely, which is also the
  * correct 100 TB shape (signatures are embarrassingly parallel).
  *
  * Null contract: null input → null; null elements are skipped. Empty
  * shingle sets yield Long.MaxValue sentinels (no shingle hashed).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSig.compute(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSig.compute($v, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  final val Golden = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — full avalanche of a 64-bit value. */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes. */
  def fnv(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = fnv(arr.getUTF8String(j))
        var i = 0
        while (i < k) {
          val g = mix(h + i * Golden)
          if (g < sig(i)) sig(i) = g
          i += 1
        }
      }
      j += 1
    }
    sig
  }
}
