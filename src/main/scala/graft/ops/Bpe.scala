package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** BPE / subword tokenization (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer whose
  * token counts a training pipeline actually budgets in. The whitespace
  * counts behind `pipeline_pack_sequences*` approximate the budget; a
  * trained model consumes SUBWORD tokens, so packing on subword counts
  * is the production form (`pipeline_pack_sequences_bpe`).
  *
  * Scale split, and why a driver-side learn loop is the right shape:
  *  - LEARN is a sequential fixpoint (each merge depends on the pair
  *    statistics AFTER the previous merge) over a word HISTOGRAM, not
  *    the corpus: one distributed `groupBy(word)` reduces 100 TB of
  *    text to a frequency table, and the top-`vocabCap` slice of that
  *    table (bounded, ~100 KB) is what the classic in-memory BPE loop
  *    consumes. This mirrors how production tokenizers are trained
  *    (sampled/capped vocabularies) — the unbounded part of the data
  *    only ever flows through the one hash aggregation.
  *  - APPLY is embarrassingly parallel: the learned merge table rides
  *    into [[graft.functions.BpeEncode]] as a codegen reference object
  *    and every document is encoded inside whole-stage codegen — no
  *    shuffle, no UDF boundary, corpus never collected.
  *
  * Determinism: the histogram is tie-broken by (count desc, word), the
  * merge loop by (pair-frequency desc, pair lexicographic) — same
  * corpus, same parameters → same merge table, same encodings,
  * bit-for-bit (spec-locked in OpsSpec with a hand-computed example).
  */
object Bpe {

  /** 30 merges: enough to fuse the high-frequency subunits while
    * leaving longer/rarer words split into several subwords — with the
    * test corpus' compact vocabulary, 100 merges reassembled every
    * word whole (fertility exactly 1.0 everywhere), which demonstrates
    * nothing about subword budgeting. Real vocabularies (30k+ merges
    * against millions of types) never saturate this way. */
  val DefaultMerges = 30
  val DefaultVocabCap = 5000

  /** Split into code points (consistent with BpeEncode.encodeWord). */
  private def codePoints(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Learn `numMerges` BPE merges from the corpus' word histogram.
    * One distributed aggregation; the driver loop sees only the
    * `vocabCap`-bounded histogram. */
  def learnMerges(docs: DataFrame, textCol: String,
      numMerges: Int = DefaultMerges,
      vocabCap: Int = DefaultVocabCap): Seq[(String, String)] = {
    val hist = docs
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(vocabCap)
      .collect().map(r => (codePoints(r.getString(0)), r.getLong(1)))
    var vocab = hist
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val freq = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        freq(p) = freq.getOrElse(p, 0L) + c
      }
      // most frequent pair; ties → lexicographically smallest pair
      val best = freq.reduceOption { (x, y) =>
        if (x._2 != y._2) { if (x._2 > y._2) x else y }
        else if (Ordering[(String, String)].lt(x._1, y._1)) x else y
      }
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          merges += ((a, b))
          vocab = vocab.map { case (syms, w) =>
            val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                next += a + b; j += 2
              } else { next += syms(j); j += 1 }
            }
            (next.toArray, w)
          }
        case _ => done = true // no pair occurs twice — nothing to gain
      }
    }
    merges.toSeq
  }

  /** Subword tokens of `textCol` under a learned merge table — a
    * codegen expression column (see [[graft.functions.BpeEncode]]). */
  def encode(textCol: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.BpeEncode(
      GraftBridge.expression(textCol),
      merges.flatMap { case (a, b) => Seq(a, b) }))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the learned merge table itself (rank-ordered) — rows-only: the
    // learn loop is a sequential fixpoint no SQL engine expresses;
    // OpsSpec locks the exact table on a hand-computed corpus
    "text_bpe_merges" -> { (s, dir) =>
      val merges = learnMerges(t(s, dir, "documents"), "text")
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }
        .toDF("rank", "left", "right")
        .orderBy(col("rank"))
    },

    // per-doc subword statistics under the learned tokenizer: the
    // fertility ratio (subwords per whitespace word) is the number
    // tokenizer evaluations track. Rows-only; determinism spec-locked.
    "text_bpe_tokens" -> { (s, dir) =>
      val merges = learnMerges(t(s, dir, "documents"), "text")
      t(s, dir, "documents")
        .withColumn("sub", encode(col("text"), merges))
        .withColumn("toks", Text.tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"),
          size(col("sub")).as("n_subwords"),
          size(col("toks")).as("n_words"),
          round(size(col("sub")).cast("double") /
            size(col("toks")), 4).as("fertility"))
        .orderBy(col("doc_id"))
    },

    // sequence packing budgeted in SUBWORD tokens — the production
    // packing form (same sharded window shape as
    // pipeline_pack_sequences_sharded, different budget column)
    "pipeline_pack_sequences_bpe" -> { (s, dir) =>
      val merges = learnMerges(t(s, dir, "documents"), "text")
      val docs = t(s, dir, "documents")
        .withColumn("n_sub", size(encode(col("text"), merges)))
      TextStats.packSequencesBy(docs, col("n_sub"), "doc_id", 8192L, 8)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("bin"))
    }
  )

  def oracleSql: Map[String, String] = Map.empty
}
