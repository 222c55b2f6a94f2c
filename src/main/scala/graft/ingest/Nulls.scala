package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Null canonicalization (reference O6, `index.js:60-67`).
  *
  * A cell is null iff its (already-trimmed) text is exactly one of the
  * lowercase tokens — membership is case-sensitive in the reference
  * (`"NULL"` stays a literal string), and we keep that.
  *
  * Divergence from the reference (SURVEY.md §2b Q5): we produce real SQL
  * NULLs in every output type; the reference conflates null with `0`
  * (int32) / `NaN` (float32) because its binary format has no null mask
  * (`index.js:467-476`).
  */
object Nulls {
  val NullSet: Seq[String] = Seq("null", "na", "n/a", "none", "", "-")

  /** Map NULL_SET tokens to real null; other values pass through. */
  def canonicalize(c: Column): Column =
    when(c.isin(NullSet: _*), lit(null)).otherwise(c)
}
