package graft.ingest

/** Column-name sanitization (reference O12, `index.js:497-508`).
  *
  * Order-sensitive replacement chain, faithfully reproduced because the
  * index sidecar maps original → sanitized names:
  * lowercase → strip edge non-word runs → `&`→`and`, `@`→`at`,
  * `%`→`percent`, `-`→`_`, then any remaining `\W+`→`_`.
  * Java and JS agree on ASCII `\W` = `[^A-Za-z0-9_]`.
  */
object Sanitize {
  def apply(name: String): String = {
    var s = name.toLowerCase
    s = s.replaceAll("(^\\W+)|(\\W+$)", "")
    s = s.replaceAll("&", "and")
    s = s.replaceAll("@", "at")
    s = s.replaceAll("%", "percent")
    s = s.replaceAll("-", "_")
    s = s.replaceAll("\\W+", "_")
    s
  }

  /** Sanitize all column names of a frame, de-duplicating collisions
    * with `_2`, `_3`, … suffixes (the reference silently overwrites
    * colliding output files, `index.js:609-635`; we diverge — data loss
    * is never intended semantics). Returns (renamedDf, original→sanitized).
    */
  def columns(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Map[String, String]) = {
    val deduped = dedupe(df.columns.toSeq.map(apply))
    val mapping = df.columns.toSeq.zip(deduped)
    (df.toDF(deduped: _*), mapping.toMap)
  }

  /** Suffix colliding names until globally unique — a per-base counter
    * alone can still collide (["a", "a_2", "a"] → "a_2" twice). */
  def dedupe(names: Seq[String]): Seq[String] = {
    val used = scala.collection.mutable.Set.empty[String]
    names.map { base =>
      var cand = base
      var i = 1
      while (used(cand)) { i += 1; cand = s"${base}_$i" }
      used += cand
      cand
    }
  }
}
