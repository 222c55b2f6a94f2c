package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the corpus-preparation operators (Corpus.scala), run
  * against the driver's sf0.001 tables.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse_test")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("pii redaction masks all but the last two account digits") {
    val rows = Corpus.queries("text_pii_redact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getLong(0).toString
      val masked = r.getString(1)
      assert(masked.length == key.length)
      assert(masked.takeRight(math.min(2, key.length)) ==
        key.takeRight(math.min(2, key.length)))
      assert(masked.dropRight(2).forall(_ == 'X'))
      assert(r.getString(2).matches("person_[0-9a-f]{8}"))
    }
  }

  test("segment dedup: n_segments = ceil(tokens/16), dup_frac in [0,1]") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(Text.tokens(col("text"))).as("n_toks"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Corpus.queries("dedup_segments")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = math.ceil(docs(r.getLong(0)) / 16.0).toLong
      assert(r.getLong(1) == expected)
      val frac = r.getDouble(3)
      assert(frac >= 0.0 && frac <= 1.0)
    }
  }

  test("source quota keeps at most 10 docs per source, best-first") {
    val rows = Corpus.queries("pipeline_source_quota")(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rs) =>
      assert(rs.length <= 10)
      val ranks = rs.map(_.getInt(2)).sorted
      assert(ranks.toSeq == (1 to rs.length))
      // score is non-increasing with rank
      val scores = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("unigram logprob: positive, and rare-token docs score higher") {
    val rows = Corpus.queries("text_unigram_logprob")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) > 0.0))
    // sanity: n_tokens matches raw token counts
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(Text.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach(r => assert(r.getLong(1) == toks(r.getLong(0))))
  }

  test("text normalization output is lowercase alphanumeric single-spaced") {
    val rows = Corpus.queries("text_normalize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(1)
      assert(t.matches("[a-z0-9 ]*"))
      assert(!t.contains("  "))
      assert(t == t.trim)
      assert(r.getInt(2) == t.length)
    }
  }
}
