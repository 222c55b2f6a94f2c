package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Determinism rules for
  * every oracle-checked query:
  *   - an explicit trailing orderBy over a unique key;
  *   - double aggregates of fractional values go through
  *     [[graft.ops.Q.dsum]] (DECIMAL(18,6) cast) so the result is
  *     independent of partitioning/summation order, with divisions done
  *     in DOUBLE on both engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.ingest.IngestQueries.queries ++
      graft.ops.Relational.queries ++
      graft.ops.Relational2.queries ++
      graft.ops.Dedup.queries ++
      graft.ops.Incremental.queries ++
      graft.ops.Graph.queries ++
      graft.ops.Corpus.queries ++
      graft.ops.Bpe.queries ++
      graft.ops.TextStats.queries ++
      graft.ops.Search.queries ++
      graft.ops.Similarity.queries ++
      graft.ops.Multimodal.queries ++
      graft.ops.AsOf.queries ++
      graft.ops.Analytics.queries ++
      graft.ops.Scale.queries ++
      graft.ops.Linkage.queries ++
      graft.ops.Warehouse.queries ++
      graft.ops.Stats.queries ++
      graft.ops.Typed.queries ++
      graft.sources.Sinks.queries ++
      graft.streaming.EventStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    graft.ingest.IngestQueries.oracleSql ++
      graft.ops.Relational.oracleSql ++
      graft.ops.Relational2.oracleSql ++
      graft.ops.Dedup.oracleSql ++
      graft.ops.Incremental.oracleSql ++
      graft.ops.Graph.oracleSql ++
      graft.ops.Corpus.oracleSql ++
      graft.ops.Bpe.oracleSql ++
      graft.ops.TextStats.oracleSql ++
      graft.ops.Search.oracleSql ++
      graft.ops.Similarity.oracleSql ++
      graft.ops.Multimodal.oracleSql ++
      graft.ops.AsOf.oracleSql ++
      graft.ops.Analytics.oracleSql ++
      graft.ops.Scale.oracleSql ++
      graft.ops.Linkage.oracleSql ++
      graft.ops.Warehouse.oracleSql ++
      graft.ops.Stats.oracleSql ++
      graft.ops.Typed.oracleSql ++
      graft.sources.Sinks.oracleSql ++
      graft.streaming.EventStream.oracleSql
}
