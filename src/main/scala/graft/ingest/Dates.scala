package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date detection + normalization (reference O7/O8,
  * `index.js:92-129,187-206,307-323,373-378,477-482`).
  *
  * Semantics: a string column is a date column iff, over the scanned
  * sample, every non-null value (a) has length 8–10 and (b) strictly
  * parses with **exactly one** of the six candidate formats — the
  * reference intersects per-row surviving-format sets; a column where
  * two formats survive (e.g. `1/2/2011`) is left as a plain string.
  * Matched columns are normalized to ISO `YYYY-MM-DD`
  * (`ISO_DATE.slice(0,10)`, `index.js:92,377`); we surface `DateType`
  * rather than the ISO string (equivalent information, SQL-native).
  *
  * Divergence (SURVEY.md §2b Q6): a value that fails the locked format
  * becomes NULL, not the literal `"Invalid date"`.
  */
object Dates {
  /** Reference `DATE_FORMATS` (`index.js:102-111`) as Spark datetime
    * patterns — moment `YYYY-M-D` strict ≙ Spark `yyyy-M-d` under the
    * CORRECTED (non-legacy) parser: 1–2 digit month/day, 4-digit year. */
  val Formats: Seq[String] = Seq(
    "yyyy-M-d", "yyyy/M/d", // ISO-ish
    "d-M-yyyy", "d/M/yyyy", // most common global
    "M-d-yyyy", "M/d/yyyy"  // U.S.
  )

  /** Datetime candidate formats — an EXTENSION beyond the reference
    * (its `TIME_FORMATS` are dead code, `index.js:113-129`, never
    * reached from the scan loop; SURVEY §2b Q7): event-log ingestion
    * hits `"2024-01-02 13:45:00"` strings on day one. Same voting
    * contract as [[Formats]]: a column is a timestamp column iff every
    * non-null scanned value strictly parses with exactly one candidate.
    * The space/`T` separator and the optional `.SSS` fraction make the
    * variants mutually exclusive on any single value, so the
    * exactly-one-surviving rule carries over unchanged. */
  val TimestampFormats: Seq[String] = Seq(
    "yyyy-M-d H:m:s",         // SQL-style datetime
    "yyyy-M-d H:m:s.SSS",     // with millisecond fraction
    "yyyy-M-d'T'H:m:s",       // ISO-8601 T separator
    "yyyy-M-d'T'H:m:s.SSS",   // ISO-8601 with fraction
    "yyyy/M/d H:m:s"          // slash-date variant
  )

  /** 1 iff `c` (non-null) strictly parses with `fmt` and has the
    * reference's candidate length 8–10 (`index.js:186,306`). */
  def parses(c: Column, fmt: String): Column =
    when(length(c).between(8, 10) && try_to_date(c, fmt).isNotNull, 1)
      .otherwise(0)

  /** Timestamp analogue of [[parses]]: candidate length 14 (minimal
    * `yyyy-M-d H:m:s`) to 23 (full fraction), strict parse. */
  def tparses(c: Column, fmt: String): Column =
    when(length(c).between(14, 23) && try_to_timestamp(c, lit(fmt)).isNotNull, 1)
      .otherwise(0)

  /** Normalize with a locked format; unparseable → NULL (intended
    * semantics for Q6). */
  def normalize(c: Column, fmt: String): Column = try_to_date(c, fmt)

  /** Timestamp normalization with a locked format; unparseable → NULL. */
  def normalizeTs(c: Column, fmt: String): Column = try_to_timestamp(c, lit(fmt))
}
