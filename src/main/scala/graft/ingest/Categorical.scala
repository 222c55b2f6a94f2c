package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical detection + dictionary encoding (reference O9/O10,
  * `index.js:33-57,226-247,346-405`).
  *
  * Detection: a column is categorical iff its distinct-value count over
  * the scanned sample is ≤
  * `min(ceil(CATEGORICAL_FRACTION · N), MAX_CATEGORICAL) · ef²` where
  * `ef` is the sampling-encounter-fraction lookup (`index.js:37-45`)
  * evaluated at the first table key ≤ the sample fraction (JS object
  * insertion-order iteration, `index.js:237-247`) and the exponent is
  * `ENTROPIC_ENCOUNTER_EXPONENT = 2` (`index.js:55`).
  *
  * Storage: Parquet dictionary-encodes low-cardinality columns
  * automatically, so detection only drives metadata + the optional code
  * materialization below — at 100 TB nothing here adds a job beyond the
  * shared inference aggregate.
  */
object Categorical {
  val CategoricalFraction = 0.3  // index.js:33
  val MaxCategorical = 65536     // index.js:57
  val EntropicExponent = 2       // index.js:55
  /** index.js:37-45, in JS insertion order (checked top-down). */
  val EncounterFractionMap: Seq[(Double, Double)] = Seq(
    1.0 -> 1.0, 0.8 -> 0.7, 0.4 -> 0.65, 0.2 -> 0.6,
    0.1 -> 0.5, 0.04 -> 0.3, 0.01 -> 0.1)

  /** `threshold` as computed at `index.js:232-247`. A sample fraction
    * below every table key leaves `ef` undefined in the reference (NaN
    * threshold ⇒ nothing categorical); we make that explicit with 0. */
  def threshold(n: Long, scanned: Long): Double = {
    val sampleFraction = if (n == 0) 1.0 else scanned.toDouble / n
    val ef = EncounterFractionMap
      .collectFirst { case (k, v) if sampleFraction >= k => v }
      .getOrElse(0.0)
    math.min(math.ceil(n * CategoricalFraction), MaxCategorical.toDouble) *
      math.pow(ef, EntropicExponent)
  }

  /** Deterministic dictionary materialization (O10): codes assigned by
    * first-encounter order (`index.js:366-368`), made reproducible under
    * parallelism by defining "first" as minimum file-order row id.
    *
    * Scale shape: one shuffle of the *distinct values only*
    * (`groupBy(value)`), a windowed rank over that (tiny — ≤ 65536 rows
    * by construction), then a broadcast join back; the full data is
    * never shuffled.
    *
    * @return (df with `<col>_code` appended, decoder code→value)
    */
  def encode(df: DataFrame, colName: String): (DataFrame, Array[String]) = {
    val withId = df.withColumn("__rid", monotonically_increasing_id())
    val grouped = withId
      .groupBy(col(colName)).agg(min(col("__rid")).as("__first"))
    // the unpartitioned window below is DELIBERATE: first-encounter
    // codes are a global order, and its input is the distinct-value set,
    // not the data — bounded by the categorical threshold. Enforce that
    // bound rather than assume it, so a caller encoding a high-cardinality
    // column fails loudly instead of funneling millions of rows through
    // one window task.
    val distinctCount = grouped.count()
    require(distinctCount <= MaxCategorical,
      s"Categorical.encode('$colName'): $distinctCount distinct values " +
        s"exceed MAX_CATEGORICAL=$MaxCategorical — this column is not " +
        "categorical; encoding it would single-task a global window")
    val dict = grouped
      .withColumn("__code",
        row_number().over(Window.orderBy(col("__first"))) - 1)
      .select(col(colName), col("__code"))
    val decoder = dict.orderBy("__code")
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull)
    val out = withId
      // null-SAFE equality: the null group gets a real code too (a plain
      // equi-join would leave every null row uncoded while the decoder
      // still advertised a code for null)
      .join(broadcast(dict.withColumnRenamed(colName, "__dv")),
        col(colName) <=> col("__dv"), "left")
      .withColumnRenamed("__code", s"${colName}_code")
      .drop("__rid", "__dv")
    (out, decoder)
  }

  /** Detection predicate used by TypeInference. */
  def isCategorical(distinct: Long, thresh: Double): Boolean =
    distinct.toDouble <= thresh
}
