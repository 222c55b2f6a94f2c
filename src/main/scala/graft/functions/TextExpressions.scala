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
