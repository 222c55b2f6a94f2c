package graft.ops

import org.apache.spark.unsafe.types.UTF8String

/** The production-scale Public Suffix List snapshot behind
  * [[Corpus.registrableDomain]].
  *
  * Source: the full dated list from publicsuffix.org (Mozilla
  * Foundation, MPL-2.0), embedded verbatim as the resource
  * `graft/public_suffix_list.dat` (Debian `publicsuffix` package
  * snapshot, version 20230209) — ICANN section plus PRIVATE DOMAINS,
  * ~9.4k literal rules, ~107 wildcard rules, 8 exception rules. The
  * r1–r13 curated subset proved the rule GRAMMAR (literals at 1–3
  * labels, wildcard bases at 1–2, exceptions at 2–3); this drops in
  * the complete list as the same literal sets, extended to the depths
  * the real list actually uses: literals at 1–5 labels, wildcard
  * bases at 1–4, exceptions unchanged at 2–3.
  *
  * Rules are parsed once per JVM at class init (a 246 KB text scan —
  * driver/executor-local, never on the wire as data) and IDNA-folded
  * label-wise through the same [[graft.functions.IdnHostAscii]] code
  * path the canonicalizer applies to hosts, so a Unicode rule
  * (`公司.cn`) matches the punycode host spelling the quota key
  * carries (`xn--55qx5d.cn`). Membership tests stay per-row `InSet`
  * hash probes inside codegen — the snapshot size changes the size of
  * five literal sets, not the plan shape.
  *
  * The reference has no URL handling at all
  * (`/root/reference/index.js` — ingest-only engine); this is the
  * mandated web-intake extension surface (SURVEY §2d).
  */
object Psl {

  /** Snapshot identity, recorded so drift is a mechanical diff. */
  val SnapshotVersion = "20230209"

  final case class Rules(
      /** literal rules by label count (1–5), punycode form */
      literals: Map[Int, Seq[String]],
      /** `*.<base>` rule BASES by base label count (1–4) */
      wildcardBases: Map[Int, Seq[String]],
      /** `!<host>` rules by label count (2–3) */
      exceptions: Map[Int, Seq[String]])

  /** IDNA fold of one rule: label-wise ToASCII via the shared
    * [[graft.functions.IdnHostAscii]] implementation (the `*` label
    * never reaches it — wildcard bases are folded after the `*.` strip). */
  private def fold(rule: String): String =
    graft.functions.IdnHostAscii
      .toAscii(UTF8String.fromString(rule.toLowerCase(java.util.Locale.ROOT)))
      .toString

  lazy val rules: Rules = parse(loadResourceLines().iterator)

  /** Lines are MATERIALIZED before the Source closes (r14 advice: the
    * lazy getLines iterator kept the resource InputStream open past
    * class init) — `Using.resource` closes the stream on every path. */
  private def loadResourceLines(): Vector[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "graft/public_suffix_list.dat resource missing")
    scala.util.Using.resource(scala.io.Source.fromInputStream(in, "UTF-8"))(
      _.getLines().toVector)
  }

  /** Parse per the published format: one rule per line up to the first
    * whitespace; `//` comments and blank lines skipped; both sections
    * (ICANN + PRIVATE DOMAINS) included — a private-section suffix
    * (`blogspot.com`) is exactly the "every subdomain is its own
    * registrant" semantics a crawl quota wants. */
  def parse(lines: Iterator[String]): Rules = {
    val lit = Map(1 to 5 map (k => k -> Vector.newBuilder[String]): _*)
    val wild = Map(1 to 4 map (k => k -> Vector.newBuilder[String]): _*)
    val exc = Map(2 to 3 map (k => k -> Vector.newBuilder[String]): _*)
    val seen = scala.collection.mutable.HashSet[String]()
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.split("\\s+")(0)
        if (rule.startsWith("!")) {
          val host = fold(rule.substring(1))
          val k = host.count(_ == '.') + 1
          require(k >= 2 && k <= 3,
            s"PSL exception at unsupported depth $k: $rule")
          if (seen.add(s"!$host")) exc(k) += host
        } else if (rule.startsWith("*.")) {
          val base = fold(rule.substring(2))
          val k = base.count(_ == '.') + 1
          require(k >= 1 && k <= 4,
            s"PSL wildcard base at unsupported depth $k: $rule")
          if (seen.add(s"*.$base")) wild(k) += base
        } else {
          val suffix = fold(rule)
          val k = suffix.count(_ == '.') + 1
          require(k >= 1 && k <= 5,
            s"PSL literal at unsupported depth $k: $rule")
          if (seen.add(suffix)) lit(k) += suffix
        }
      }
    }
    Rules(lit.map { case (k, b) => k -> b.result() },
      wild.map { case (k, b) => k -> b.result() },
      exc.map { case (k, b) => k -> b.result() })
  }
}
