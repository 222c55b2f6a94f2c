package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IDNA host fold: every raw-Unicode label of a (lowercased) DNS host
  * is converted to its punycode (RFC 3492) A-label, so the two
  * spellings of one registrable domain — `bücher.de` and
  * `xn--bcher-kva.de` — key a single quota group. Real crawls carry
  * both spellings constantly; without the fold a per-domain quota
  * silently doubles a registrant's budget.
  *
  * Scale shape: a single branch-free `isFullAscii()` check keeps the
  * overwhelmingly common all-ASCII host on a zero-allocation fast path
  * (the input UTF8String is returned as-is); only hosts that actually
  * carry non-ASCII bytes pay the per-label IDNA conversion. The
  * conversion itself is `java.net.IDN.toASCII` — the JDK's IDNA
  * implementation (ToASCII of RFC 3490 with the RFC 3492 bootstring
  * encoder) — applied label-wise so one malformed label degrades to
  * pass-through instead of poisoning the whole host. Codegen'd via a
  * static call, so the expression stays inside whole-stage codegen
  * next to the rest of [[graft.ops.Corpus.canonicalizeUrl]]'s regexp
  * chain.
  *
  * Idempotent by construction: the output is all-ASCII, so a second
  * application takes the fast path and returns it unchanged — the
  * canonicalizer's projection property survives the fold.
  *
  * The reference has no URL/IDN handling at all (ingest-only engine,
  * `/root/reference/index.js`); this is part of the mandated
  * web-intake extension surface (SURVEY §2d).
  */
case class IdnHostAscii(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_idn_host_ascii requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_idn_host_ascii"

  override def nullSafeEval(h: Any): Any =
    IdnHostAscii.toAscii(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IdnHostAscii.toAscii($c);")

  override protected def withNewChildInternal(newChild: Expression): IdnHostAscii =
    copy(child = newChild)
}

object IdnHostAscii {

  /** Label-wise IDNA ToASCII with an all-ASCII fast path. Labels the
    * JDK rejects (over-long post-encoding, prohibited code points)
    * pass through unchanged — the conservative choice for a quota key:
    * a malformed host still groups consistently with itself. The
    * result of a successful conversion is lowercased (nameprep already
    * case-folds, but the JDK preserves pre-composed edge cases). */
  def toAscii(h: UTF8String): UTF8String = {
    if (h.isFullAscii) return h
    val labels = h.toString.split("\\.", -1)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      var ascii = true
      var j = 0
      while (j < l.length && ascii) {
        if (l.charAt(j) >= 0x80) ascii = false
        j += 1
      }
      if (!ascii) {
        labels(i) =
          try java.net.IDN.toASCII(l).toLowerCase(java.util.Locale.ROOT)
          catch { case _: IllegalArgumentException => l }
      }
      i += 1
    }
    UTF8String.fromString(labels.mkString("."))
  }
}
