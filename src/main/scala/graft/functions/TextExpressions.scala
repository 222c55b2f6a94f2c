package graft.functions

import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Word w-shingles as a single-pass native expression.
  *
  * The composed built-in formulation (`transform(sequence(...),
  * i -> concat_ws(slice(tokens, i, w)))`) is evaluated through
  * interpreted lambda dispatch per shingle per token — the dominant cost
  * of the MinHash pipeline. This expression tokenizes and shingles in
  * one pass over the string per ROW (CodegenFallback: the per-row
  * interpreted-call overhead is negligible; the inner loop is plain
  * JVM code).
  *
  * Semantics match `Text.wordShinglesHof`: whitespace = single space,
  * empty tokens dropped, docs with fewer than w tokens yield one
  * shingle containing all tokens joined by spaces.
  */
case class WordShingles(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .split(' ').filter(_.nonEmpty)
    val out: Array[Any] =
      if (toks.length < w) Array(UTF8String.fromString(toks.mkString(" ")))
      else Array.tabulate(toks.length - w + 1) { i =>
        UTF8String.fromString(toks.slice(i, i + w).mkString(" "))
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Fused `array_distinct(transform(char_shingles(text, n), xxhash64))`:
  * the SORTED distinct xxhash64 (seed 42, byte-identical to Spark's
  * built-in) values of the character n-grams, computed in one pass with
  * no intermediate shingle-string array. The composed formulation
  * allocates one UTF8String per shingle and string-compares them for
  * the distinct; this hashes each code-point window's UTF-8 bytes
  * directly and dedups longs — the set-building stage of containment /
  * n-gram dedup drops from string-alloc-bound to hash-bound. Output
  * order is ascending (a set, not a sequence — callers re-order by df
  * anyway). */
case class CharShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_shingle_hashes requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val u = input.asInstanceOf[UTF8String]
    val nBytes = u.numBytes()
    // byte offset of each code point (one linear walk, no decode)
    var cps = 0
    var b = 0
    while (b < nBytes) {
      b += UTF8String.numBytesForFirstByte(u.getByte(b)); cps += 1
    }
    val offs = new Array[Int](cps + 1)
    var i = 0
    b = 0
    while (b < nBytes) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(u.getByte(b)); i += 1
    }
    offs(cps) = nBytes
    val base = u.getBaseObject
    val off = u.getBaseOffset
    val hashes =
      if (cps < n) Array(XXH64.hashUnsafeBytes(base, off, nBytes, 42L))
      else Array.tabulate(cps - n + 1) { k =>
        XXH64.hashUnsafeBytes(base, off + offs(k), offs(k + n) - offs(k), 42L)
      }
    java.util.Arrays.sort(hashes)
    var w = 0
    var r = 0
    while (r < hashes.length) {
      if (r == 0 || hashes(r) != hashes(r - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharShingleHashes = copy(child = newChild)
}

/** Character n-grams, same single-pass rationale as [[WordShingles]].
  * Strings shorter than n yield the whole string as one shingle. */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_shingles requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // iterate by CODE POINTS, matching Spark's length/substr semantics —
    // UTF-16 unit slicing would split surrogate pairs (emoji, CJK-ext)
    val cps = s.codePointCount(0, s.length)
    val out: Array[Any] =
      if (cps < n) Array(UTF8String.fromString(s))
      else Array.tabulate(cps - n + 1) { i =>
        val from = s.offsetByCodePoints(0, i)
        val to = s.offsetByCodePoints(from, n)
        UTF8String.fromString(s.substring(from, to))
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}
