package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared query helpers. */
object Q {
  /** Read one of the driver's parquet tables.
    *
    * The 2026-08-13 testdata regeneration switched every temporal
    * column to parquet `timestamp[us]` WITHOUT the UTC flag (previously
    * `ts` was nanos and `o_orderdate`/`l_shipdate` were DATE), which
    * Spark surfaces as TIMESTAMP_NTZ — a type `unix_micros`, interval
    * arithmetic, and half the temporal function surface reject.
    * Normalize here, once, for every consumer: cast NTZ → TIMESTAMP.
    * Sessions run with spark.sql.session.timeZone=UTC, so the cast
    * reinterprets the naive wall-clock as the identical UTC instant —
    * restoring exactly the types the whole query surface (and its
    * DuckDB oracles, which see naive timestamps either way) was built
    * against. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast(TimestampType)))
  }

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark only
    * reads as LongType (spark.sql.legacy.parquet.nanosAsLong — set in
    * Verify/Bench sessions). Surface `ts` as a microsecond timestamp,
    * matching DuckDB's TIMESTAMP_NS → TIMESTAMP truncation. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Order-independent exact sum of a fractional double expression:
    * the per-row value is IEEE-deterministic, the DECIMAL(18,6) cast
    * rounds identically in Spark and DuckDB, and decimal addition is
    * associative — so the final DOUBLE is independent of partitioning
    * and summation order. The DuckDB oracle mirrors it as
    * `CAST(sum(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Mean via dsum; the division must happen in DOUBLE on both engines
    * (decimal division scales differ between Spark and DuckDB). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Cross-engine-safe 6-dp quantization: floor(x·1e6 + 0.5)/1e6.
    * `round(x, 6)` differs between Spark (decimal-exact HALF_UP on the
    * binary value) and DuckDB (float multiply + nearbyint) within ~1
    * ulp of a .5 boundary — a divergence window that real data DOES
    * hit (~1 row in 15k for a decimal-sum/count mean at sf0.1). The
    * floor form is the same IEEE multiply/add/floor on both engines,
    * so there is no window at all. Use for rounded DIVISION results
    * (means) and recursions; plain round stays fine for values already
    * exact at 6 dp (decimal sums). */
  def q6(c: Column): Column = floor(c * 1000000.0 + lit(0.5)) / 1000000.0

  /** Same trick for running/windowed sums. */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(18, 6))).over(w).cast(DoubleType)

  /** Scale-adaptive scan spread (optimization guide §2.5 "input skew:
    * one huge unsplittable file … repartition immediately after the
    * read"). Every test-SF table is ONE parquet row group, so a scan
    * task cannot be split by `spark.sql.files.maxPartitionBytes` and
    * every pre-exchange operator runs on ONE core no matter the session
    * parallelism — at sf0.1 the q_corr_matrix decimal casts measured
    * 5.0 s of a 5.2 s query on that single task. Hash-exchange the
    * (projected!) scan output across the session's cores on a
    * deterministic whole-row xxhash64 key, but ONLY when the scan is
    * narrower than the session — at production scale the inputs arrive
    * in thousands of splits, the guard is false, and no exchange is
    * added. Callers must only use this below order-INDEPENDENT
    * consumers (decimal sums, counts, hash aggregations, joins) —
    * never below first/collect_list-style order-sensitive ones, and
    * only on projections with high row-distinctness (a low-cardinality
    * column set would hash duplicates back onto few hot partitions).
    *
    * Keyless round-robin repartition was rejected, not for
    * determinism (SPARK-23207's sort-before-repartition keeps retries
    * safe) but for its cost: that safety sort measured ~0.6 s of pure
    * overhead on the 600k-row corr exchange, while the deterministic
    * hash key is retry-safe with no sort at all. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else {
      // hash-partition on a deterministic whole-row hash rather than
      // round-robin: keyless repartition(n) first pays a local SORT of
      // the input (sortBeforeRepartition, SPARK-23207) — measured ~0.6 s
      // of pure overhead on the 600k-row corr exchange — while a
      // deterministic key is retry-safe without it (guide §2.5: derive
      // the synthetic key deterministically, never from rand()).
      df.repartition(target, xxhash64(df.columns.map(col): _*))
    }
  }

  /** Keyed analogue of [[spread]] for aggregate/distinct consumers:
    * repartition by the consumer's OWN keys — the downstream
    * `distinct()`/`groupBy` on the same keys then reuses this exchange
    * (guide §2.4: same keys ⇒ same partitioning ⇒ no second
    * exchange), so the dedup runs across cores instead of inside the
    * one-row-group scan task. Guarded exactly like [[spread]]: when
    * the scan already has ≥ session-parallelism partitions (any
    * production layout, and the 10× probe dirs), this is a no-op and
    * the plain distinct KEEPS its map-side partial aggregate — the
    * r15 verdict's scale concern with the unguarded form, which
    * shuffled raw pre-dedup rows at every layout.
    *
    * Same caveat as [[spread]] on the planning pass: the guard reads
    * the physical scan's partition count, which plans the (narrow)
    * subtree once more — fine at these few call sites on bare
    * scan+projects; derive from file-split stats before letting it
    * spread to wide plans. */
  def spreadBy(df: DataFrame, cols: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(cols: _*)
  }
}
