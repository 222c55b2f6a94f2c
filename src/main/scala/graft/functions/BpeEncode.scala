package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge table to a text column, returning the
  * subword tokens — the tokenizer-budget primitive: packing and
  * filtering pipelines budget in SUBWORD tokens, not whitespace words,
  * because that is what the trained model consumes.
  *
  * `merges` is the rank-ordered merge list flattened as
  * [left0, right0, left1, right1, …] (learned once on the driver from a
  * bounded word histogram — [[graft.ops.Bpe.learnMerges]]); it rides
  * into generated code as one codegen reference object, so application
  * is a per-row static call inside whole-stage codegen — no shuffle, no
  * UDF boundary, no per-row closure dispatch.
  *
  * Semantics (classic word-internal BPE, Sennrich et al. 2016, applied
  * per whitespace word without an end-of-word marker): split the text
  * on whitespace; start each word as its character (code point)
  * sequence; apply each merge in rank order, replacing every adjacent
  * (left, right) occurrence left-to-right. Deterministic by
  * construction — same merges, same text, same subwords.
  */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val mergeArr: Array[String] = merges.toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", mergeArr,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeEncode.encode($v, $mergesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Shared by eval and codegen. Words are processed independently, so
    * the working buffer is word-sized regardless of document length. */
  def encode(text: UTF8String, merges: Array[String]): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]
    val words = text.toString.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) encodeWord(w, merges, out)
      wi += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWord(word: String, merges: Array[String],
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    // code-point split (consistent with charShingles' code-point stance)
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    var m = 0
    while (m + 1 < merges.length && syms.length > 1) {
      val a = merges(m); val b = merges(m + 1)
      var j = 0
      var next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
          next += a + b
          j += 2 // left-to-right, non-overlapping — aaa + (a,a) → [aa, a]
        } else {
          next += syms(j)
          j += 1
        }
      }
      syms = next
      m += 2
    }
    var k = 0
    while (k < syms.length) {
      out += UTF8String.fromString(syms(k))
      k += 1
    }
  }
}
