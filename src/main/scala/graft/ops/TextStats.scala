package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Q._

/** Text analysis for training-data pipelines: quality scoring, language
  * identification (stopword-profile heuristic), token counting
  * (whitespace + BPE-ish regex), and content fingerprinting.
  *
  * All per-document — embarrassingly parallel, no shuffles except final
  * aggregations; every expression is a codegen'd built-in.
  */
object TextStats {

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "dans", "que", "les", "pour"))
  /** Deterministic tie-break precedence. */
  val LangOrder: Seq[String] = Seq("en", "de", "es", "fr")

  def stopwordCount(toks: Column, lang: String): Column =
    size(filter(toks, x => x.isin(Stopwords(lang): _*)))

  /** Argmax over language scores with fixed precedence on ties. */
  def predictLang(scores: Map[String, Column]): Column =
    LangOrder.dropRight(1).foldRight(lit(LangOrder.last)) { (l, rest) =>
      val others = LangOrder.dropWhile(_ != l).drop(1)
      when(others.map(o => scores(l) >= scores(o)).reduce(_ && _), lit(l))
        .otherwise(rest)
    }

  /** BPE-ish token count: letter runs, digit runs, single other symbols.
    * Portable regex (no \s / shorthand classes). */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Characteristic character-trigram profiles (ASCII; the n-gram
    * flavor of language ID, complementing the stopword profiles). */
  val TrigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "ing", "and", " th", "ion"),
    "de" -> Seq("der", "und", "sch", "ein", "ich"),
    "es" -> Seq("que", "los", " de", "ent", "cio"),
    "fr" -> Seq("les", " le", "ait", "oun", "eur"))

  /** Sharded concat-then-chunk sequence packing — the 100 TB shape of
    * `pipeline_pack_sequences`: hash docs into `shards`, run the
    * running-token-count window INSIDE each shard (shuffle on shard id,
    * no global sort), and make bin ids globally unique as
    * (shard, local bin). Each doc lands in the bin where its first
    * token falls, so a bin's docs all start inside one `tokenBudget`
    * span — the invariant OpsSpec locks. */
  def packSequences(docs: DataFrame, textCol: String, orderCol: String,
      tokenBudget: Long, shards: Int): DataFrame =
    packSequencesBy(docs, size(Text.tokens(col(textCol))), orderCol,
      tokenBudget, shards)

  /** [[packSequences]] with a caller-supplied token-count expression —
    * the budget column is the tokenizer's business (whitespace words,
    * BPE subwords, …), the packing shape is not. */
  def packSequencesBy(docs: DataFrame, nTokens: Column, orderCol: String,
      tokenBudget: Long, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(col(orderCol), lit(shards)))
      .withColumn("n_tokens", nTokens)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin_start", col("cum") - col("n_tokens"))
      .withColumn("bin", floor(col("bin_start") / tokenBudget))
      .select(col(orderCol), col("shard"), col("bin"), col("n_tokens"),
        col("bin_start"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // quality scoring: length / token stats / stopword density
    "text_quality" -> { (s, dir) =>
      val toks = Text.tokens(col("text"))
      t(s, dir, "documents")
        .withColumn("toks", toks)
        // token-less docs: Spark's x/0 → NULL but DuckDB's list_reduce
        // on an empty list ERRORS, poisoning the whole oracle compare
        .filter(size(col("toks")) > 0)
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          size(col("toks")).as("n_tokens"),
          (aggregate(col("toks"), lit(0),
            (acc, x) => acc + length(x)).cast(DoubleType) /
            size(col("toks"))).as("avg_token_len"),
          (stopwordCount(col("toks"), "en").cast(DoubleType) /
            size(col("toks"))).as("stopword_ratio"),
          (size(array_distinct(col("toks"))).cast(DoubleType) /
            size(col("toks"))).as("distinct_ratio"))
        .orderBy(col("doc_id"))
    },
    // language id: stopword-profile scores + argmax
    "text_langid" -> { (s, dir) =>
      val withToks = t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
      val scored = withToks.select(
        (Seq(col("doc_id"), col("lang").as("declared_lang")) ++
          LangOrder.map(l =>
            stopwordCount(col("toks"), l).as(s"s_$l"))): _*)
      val scores = LangOrder.map(l => l -> col(s"s_$l")).toMap
      scored.withColumn("pred_lang", predictLang(scores))
        .orderBy(col("doc_id"))
    },
    // per-doc character-distribution Shannon entropy — the
    // compressibility proxy quality filters use next to the repetition
    // rules (binary blobs and keyboard-mash score far from prose's
    // ~4.1 bits/char; here in nats). One char explode (n_chars rows)
    // → per-(doc, char) counts → per-doc decimal-summed −Σp·ln p;
    // vocabulary is char-bounded so the second agg is tiny.
    "text_char_entropy" -> { (s, dir) =>
      val chars = t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), length(col("text")).as("len"),
          explode(split(col("text"), "")).as("ch"))
      chars.groupBy(col("doc_id"), col("len"), col("ch"))
        .agg(count(lit(1)).as("c"))
        .withColumn("p", col("c").cast(DoubleType) / col("len"))
        .groupBy(col("doc_id"))
        .agg(max(col("len")).as("n_chars"),
          count(lit(1)).as("n_distinct_chars"),
          q6(dsum(-col("p") * log(col("p")))).as("entropy_nats"))
        .orderBy(col("doc_id"))
    },

    // language-ID confusion matrix + per-class recall — the EVAL that
    // turns the classifier into a monitored component (which languages
    // leak into which). Same scoring as text_langid, then one
    // |langs|²-bounded agg; recall via a per-true-class window over
    // that bounded grid.
    "text_langid_confusion" -> { (s, dir) =>
      val withToks = t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
      val scored = withToks.select(
        (Seq(col("doc_id"), col("lang").as("declared_lang")) ++
          LangOrder.map(l =>
            stopwordCount(col("toks"), l).as(s"s_$l"))): _*)
      val scores = LangOrder.map(l => l -> col(s"s_$l")).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("declared_lang"))
      scored.withColumn("pred_lang", predictLang(scores))
        .groupBy(col("declared_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .withColumn("recall",
          round(col("n").cast(DoubleType) / sum(col("n")).over(w), 6))
        .orderBy(col("declared_lang"), col("pred_lang"))
    },

    // language id, n-gram flavor: distinct char-3-gram overlap with
    // per-language trigram profiles + the same argmax precedence
    "text_langid_ngram" -> { (s, dir) =>
      val scored = t(s, dir, "documents")
        .withColumn("g3", array_distinct(Text.charShingles(col("text"), 3)))
        .select(Seq(col("doc_id"), col("lang").as("declared_lang")) ++
          LangOrder.map(l => size(array_intersect(col("g3"),
            lit(TrigramProfiles(l).toArray))).as(s"s_$l")): _*)
      val scores = LangOrder.map(l => l -> col(s"s_$l")).toMap
      scored.withColumn("pred_lang", predictLang(scores))
        .orderBy(col("doc_id"))
    },
    // token counting: whitespace vs BPE-ish regex
    "text_token_count" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(Text.tokens(col("text"))).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
            .as("bpe_tokens"),
          length(col("text")).as("n_chars"))
        .orderBy(col("doc_id"))
    },
    // content fingerprint + per-fingerprint group size
    "text_fingerprint" -> { (s, dir) =>
      val fp = t(s, dir, "documents")
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      val groups = fp.groupBy(col("fp")).agg(count(lit(1)).as("group_size"))
      fp.join(groups, "fp")
        .select(col("doc_id"), col("fp"), col("group_size"))
        .orderBy(col("doc_id"))
    },
    // corpus-level term frequency: tokenize → explode → count (top 50)
    "text_term_freq" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(50)
    },

    // Gopher-style quality rule flags (word-count bounds, mean word
    // length, alphabetic-word ratio, stopword presence) — the rule-based
    // filter stage of a training-data pipeline, per-doc codegen only
    "text_gopher_rules" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .select(
          col("doc_id"),
          size(col("toks")).as("n_words"),
          (aggregate(col("toks"), lit(0),
            (a, x) => a + length(x)).cast(DoubleType) /
            size(col("toks"))).as("mean_word_len"),
          (size(filter(col("toks"), x => x.rlike("[a-z]"))).cast(DoubleType) /
            size(col("toks"))).as("alpha_word_ratio"),
          stopwordCount(col("toks"), "en").as("stopword_hits"))
        .withColumn("pass",
          col("n_words").between(50, 100000) &&
            col("mean_word_len").between(3.0, 10.0) &&
            col("alpha_word_ratio") > 0.8 &&
            col("stopword_hits") >= 2)
        .orderBy(col("doc_id"))
    },
    // repetition detection: most-frequent-word and most-frequent-bigram
    // fractions (the "repetitive document" removal signal) — two
    // explode→agg passes, both partial+final hash aggs
    "text_repetition" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
        .filter(size(col("toks")) > 1)
      val uni = d
        .select(col("doc_id"), size(col("toks")).as("n_tokens"),
          explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("n_tokens"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("n_tokens"))
        .agg(max(col("c")).as("top_word"))
      val bi = d
        .select(col("doc_id"), explode(Text.wordShingles(col("text"), 2)).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_bigram"), sum(col("c")).as("n_bigrams"))
      uni.join(bi, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          round(col("top_word").cast(DoubleType) / col("n_tokens"), 6)
            .as("top_word_frac"),
          round(col("top_bigram").cast(DoubleType) / col("n_bigrams"), 6)
            .as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    },
    // benchmark-contamination screen: flag documents sharing any word
    // 8-gram with the held-out set (source = src0 stands in for the
    // benchmark). Distinct grams per side + one equi-join — at real
    // scale join on xxhash64(gram) instead of the gram string (same
    // plan shape, 8 bytes a key); strings kept here for oracle parity.
    "text_contamination" -> { (s, dir) =>
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(array_distinct(Text.wordShingles(col("text"), 8))).as("g"))
      val bench = grams.filter(col("source") === "src0")
        .select(col("g")).distinct()
      grams.filter(col("source") =!= "src0")
        .join(bench, "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared_grams"))
        .orderBy(col("doc_id"))
    },

    // order-sensitive Karp–Rabin fingerprint (vs the order-insensitive
    // md5 token fingerprint above) via the codegen RollingHash expression
    "text_rolling_hash" -> { (s, dir) =>
      import org.apache.spark.sql.GraftBridge
      t(s, dir, "documents")
        .select(col("doc_id"), GraftBridge.column(
          graft.functions.RollingHash(GraftBridge.expression(col("text"))))
          .as("rh"))
        .orderBy(col("doc_id"))
    },

    // TF-IDF: per-(doc, term) tf × smoothed idf. Three aggregations,
    // all partial+final hash aggs; the doc count is a broadcast scalar.
    "text_tfidf" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val total = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(dfreq, "term").crossJoin(broadcast(total))
        .withColumn("tfidf",
          round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
        .orderBy(col("doc_id"), col("term"))
    },

    // sequence packing for training: concatenate docs in a stable order
    // and cut at a fixed token budget — each doc's bin is determined by
    // the running token count before it (concat-then-chunk packing).
    // The global running sum is a single-partition window HERE for
    // oracle determinism; at 100 TB pack per shard instead:
    // repartitionByRange on the sort key, then the same window inside
    // each shard (bin ids offset by shard), which needs no global order.
    "pipeline_pack_sequences" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .withColumn("n_tokens", size(Text.tokens(col("text"))))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("bin", floor((col("cum") - col("n_tokens")) / 8192))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("bin"))
    },
    // the 100 TB shape of sequence packing, now the PRIMARY registered
    // form: hash docs into 8 shards and run the running-token window
    // INSIDE each shard (shuffle on shard id, no global sort, no
    // single-partition WindowExec) — bin ids are (shard, local bin).
    // The global-window form above stays as the total-order anchor.
    "pipeline_pack_sequences_sharded" -> { (s, dir) =>
      packSequences(t(s, dir, "documents"), "text", "doc_id", 8192L, 8)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("bin"))
    },
    // leakage-safe split: a near-dup of a training doc in the test set
    // is contamination, so split assignment must move WHOLE near-dup
    // components, not docs — each doc splits by its component
    // representative (min id; singletons by their own id), and the
    // audit columns PROVE the property: n_leaky_safe counts near-dup
    // pairs straddling splits under this rule (must be 0) vs the naive
    // per-doc rule's count on the same pairs. Pair source here is the
    // exact-Jaccard anchor for the oracle; at scale swap the MinHash
    // band join — the component/assign/audit plan is unchanged.
    "pipeline_split_leakage_safe" -> { (s, dir) =>
      def splitOf(c: Column): Column =
        when(c % 10 < 8, "train").when(c % 10 === 8, "val")
          .otherwise("test")
      // checkpoint: feeds components() iterations AND both audit joins
      val pairs = Dedup.exactJaccardPairs(s, dir, 0.5)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val comp = Dedup.components(pairs, "id_a", "id_b")
      val assign = t(s, dir, "documents").select(col("doc_id"))
        .join(comp, col("doc_id") === col("id"), "left")
        .withColumn("split", splitOf(coalesce(col("comp"), col("doc_id"))))
        .select(col("doc_id"), col("split"))
      val counts = assign.agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      pairs
        .join(assign.select(col("doc_id").as("id_a"),
          col("split").as("sa")), "id_a")
        .join(assign.select(col("doc_id").as("id_b"),
          col("split").as("sb")), "id_b")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
            .as("n_leaky_safe"),
          sum(when(splitOf(col("id_a")) =!= splitOf(col("id_b")), 1L)
            .otherwise(0L)).as("n_leaky_naive"))
        .crossJoin(counts) // two 1-row frames
    },

    // deterministic stratified train/val/test split (hash-free so both
    // engines agree: doc_id mod 10 → 8/1/1) + per-(split, lang) stats —
    // the reproducible-split stage of a training-data pipeline
    "pipeline_stratified_split" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("split",
          when(col("doc_id") % 10 < 8, "train")
            .when(col("doc_id") % 10 === 8, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("lang"))
    },

    // per-language quantile quality gate: keep docs whose distinct-token
    // ratio is above their LANGUAGE's median — per-group adaptive
    // thresholds instead of one global cutoff (an English cutoff is
    // wrong for German). One shuffle on lang; the median is an exact
    // percentile window over each lang partition (bounded by the
    // per-lang doc count; at 100 TB switch to approx_percentile in a
    // pre-aggregate and broadcast the per-lang thresholds).
    "pipeline_quality_gate_quantile" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val scored = t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .withColumn("distinct_ratio",
          size(array_distinct(col("toks"))).cast(DoubleType) /
            size(col("toks")))
      val w = Window.partitionBy(col("lang"))
      scored
        .withColumn("lang_median",
          expr("percentile(distinct_ratio, 0.5)").over(w))
        .filter(col("distinct_ratio") > col("lang_median"))
        .select(col("doc_id"), col("lang"),
          round(col("distinct_ratio"), 6).as("distinct_ratio"),
          round(col("lang_median"), 6).as("lang_median"))
        .orderBy(col("doc_id"))
    },
    // overlapping token-window chunking (retrieval/RAG prep): fixed
    // 128-token chunks at stride 64 — per-row sequence generate +
    // explode, embarrassingly parallel, no shuffle at all
    "pipeline_chunk_overlap" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_tokens", size(Text.tokens(col("text"))))
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("n_tokens"),
          posexplode(sequence(lit(0), col("n_tokens") - 1, lit(64))))
        .select(col("doc_id"),
          col("pos").cast(LongType).as("chunk_idx"),
          col("col").cast(LongType).as("chunk_start"),
          least(lit(128), col("n_tokens") - col("col"))
            .cast(LongType).as("chunk_len"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    // deterministic hash-based corpus sampling: keep a doc iff the hex
    // md5 of its id starts below '20' (a ~12.5% Bernoulli sample that is
    // reproducible across engines, runs, and cluster sizes — no RNG
    // state, no seed plumbing); reported per (lang, source) so quota
    // drift is visible. The per-row hash is codegen'd; one final agg.
    "pipeline_hash_sample" -> { (s, dir) =>
      t(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast(StringType)), 1, 2) < "20")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("sampled_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("source"))
    },

    // exact-k per-stratum sampling: every source downsampled to
    // exactly min(k, |source|) docs, chosen by md5 rank — uniform-ish,
    // reproducible on any engine/cluster/run (the Bernoulli
    // pipeline_hash_sample cannot promise a count; this cannot promise
    // a rate). One shuffle on source + a bounded window (rows ranked
    // past k are discarded by the filter, never sorted globally).
    "pipeline_sample_k_per_source" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("doc_id"), col("rk"))
        .orderBy(col("source"), col("rk"))
    },

    // WEIGHTED sampling without replacement (Efraimidis–Spirakis
    // A-Res), exact-k per language: rank by key = ln(u)/w where w is
    // the doc's weight (longer docs likelier) and u a deterministic
    // 52-bit uniform from md5(doc_id) — reproducible on any engine/
    // cluster/run, unlike rand()-seeded sampling whose draw order is
    // partition-dependent. One shuffle on lang + a bounded window —
    // the distributed shape of a weighted reservoir. ln/division are
    // IEEE doubles on both engines; a rank flip needs two keys within
    // 1 ulp (u spans 2^52 values — same accepted risk class as the
    // cosine-threshold compares).
    "pipeline_weighted_sample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val u = (conv(substring(md5(col("doc_id").cast(StringType)), 1, 13),
        16, 10).cast(LongType) + 1).cast(DoubleType) / lit(4503599627370496.0)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("key").desc, col("doc_id"))
      t(s, dir, "documents")
        .withColumn("key", log(u) / col("n_chars").cast(DoubleType))
        .withColumn("pick_rank", row_number().over(w))
        .filter(col("pick_rank") <= 5)
        .select(col("lang"), col("pick_rank"), col("doc_id"), col("n_chars"),
          round(col("key"), 6).as("key"))
        .orderBy(col("lang"), col("pick_rank"))
    },

    // Zipf-fit corpus diagnostic: OLS of ln(freq) on ln(rank) over the
    // corpus term-frequency table — slope ≈ −1 is the healthy natural-
    // text signature; a flat slope flags templated/synthetic text, a
    // cliff flags boilerplate domination. One token-count agg (the same
    // shuffle text_term_freq already pays) + a rank window + one
    // 4-scalar regression agg.
    "text_zipf_fit" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val freq = t(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("f"))
      val ranked = freq.withColumn("r",
        row_number().over(Window.orderBy(col("f").desc, col("token"))))
      ranked
        .agg(count(lit(1)).as("n_types"),
          sum(col("f")).as("n_tokens"),
          round(regr_slope(log(col("f")), log(col("r"))), 6).as("zipf_slope"),
          round(regr_r2(log(col("f")), log(col("r"))), 6).as("zipf_r2"))
    },

    // end-to-end corpus cleaning: quality gate → exact near-dup removal
    // (fingerprint keep-first) → per-(lang, source) stats. The composed
    // pipeline a training-data run would execute, as one declarative
    // plan Catalyst optimizes end to end.
    "pipeline_clean_corpus" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val enriched = t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("distinct_ratio",
          size(array_distinct(col("toks"))).cast(DoubleType) / size(col("toks")))
        .withColumn("fp", Text.fingerprint(col("text")))
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      enriched
        .filter(col("n_tokens") >= 20 && col("distinct_ratio") >= 0.3)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          davg(col("n_chars")).as("avg_chars"))
        .orderBy(col("lang"), col("source"))
    },

    // pipeline OBSERVABILITY: the survivorship funnel — how many docs
    // survive each curation stage (Gopher quality gate → exact
    // fingerprint dedup → benchmark decontamination) and what fraction
    // of the previous stage that is. The number a 100 TB run is
    // steered by ("why did stage 3 eat 40% of the corpus?"); each
    // stage count is a partial+final aggregate over the stage's
    // surviving rows, the 4-row funnel table itself is metadata-sized,
    // and the lag window runs over those 4 rows only.
    "pipeline_funnel_report" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val gq = docs.withColumn("toks", Text.tokens(col("text")))
        .withColumn("n_words", size(col("toks")))
        .withColumn("gopher_pass",
          col("n_words") > 0 &&
            col("n_words").between(50, 100000) &&
            (aggregate(col("toks"), lit(0), (a, x) => a + length(x))
              .cast(DoubleType) / col("n_words")).between(3.0, 10.0) &&
            (size(filter(col("toks"), x => x.rlike("[a-z]")))
              .cast(DoubleType) / col("n_words")) > 0.8 &&
            stopwordCount(col("toks"), "en") >= 2)
      val surv1 = gq.filter(col("gopher_pass"))
        .select(col("doc_id"), col("source"), col("text"))
      val wfp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val surv2 = surv1.withColumn("fp", Text.fingerprint(col("text")))
        .withColumn("rn", row_number().over(wfp)).filter(col("rn") === 1)
        .select(col("doc_id"), col("source"))
      // contamination flags vs the src0 "benchmark" — same distinct-gram
      // equi-join shape as text_contamination
      val grams = docs.select(col("doc_id"), col("source"),
        explode(array_distinct(Text.wordShingles(col("text"), 8))).as("g"))
      val contam = grams.filter(col("source") =!= "src0")
        .join(grams.filter(col("source") === "src0")
          .select(col("g")).distinct(), "g")
        .select(col("doc_id")).distinct()
      val surv3 = surv2.filter(col("source") =!= "src0")
        .join(contam, Seq("doc_id"), "left_anti")
      def stage(i: Int, name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(i).as("stage"), lit(name).as("stage_name"),
            col("n_docs"))
      val funnel = stage(0, "ingested", docs)
        .union(stage(1, "quality_gate", surv1))
        .union(stage(2, "exact_dedup", surv2))
        .union(stage(3, "decontaminated", surv3))
      val wl = Window.orderBy(col("stage"))
      val prev = lag(col("n_docs"), 1).over(wl)
      funnel.withColumn("frac_of_prev",
          round(when(prev.isNull || prev === 0, lit(1.0))
            .otherwise(col("n_docs").cast(DoubleType) / prev), 6))
        .orderBy(col("stage"))
    },

    // Flesch reading-ease per language: words / sentences / syllable
    // groups counted by three regex extracts per document (codegen'd,
    // embarrassingly parallel — the per-doc triple never shuffles),
    // then the standard 206.835 − 1.015·(W/S) − 84.6·(Syl/W) score
    // decimal-averaged per language. Sentences floor at 1 (the
    // synthetic corpus has no terminal punctuation) and words at 1 in
    // the denominator, so the score is total on every document.
    "text_flesch_readability" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("words",
          size(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
            lit(0))))
        .withColumn("sents",
          greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"),
            lit(0))), lit(1)))
        .withColumn("syll",
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"),
            lit(0))))
        .withColumn("score",
          lit(206.835) - lit(1.015) *
            (col("words").cast(DoubleType) / col("sents")) -
            lit(84.6) * (col("syll").cast(DoubleType) /
              greatest(col("words"), lit(1))))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(davg(col("score")), 6).as("flesch"))
        .orderBy(col("lang"))
    },

    // RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    // maximal stopword-free word runs (every stopword occurrence is
    // rewritten to a delimiter in ONE regexp pass, so consecutive
    // stopwords can't swallow a boundary), word score = degree/freq
    // over the phrase containment graph, phrase score = Σ word scores.
    // Both word aggregates are vocabulary-bounded; the word-score join
    // back onto phrase words broadcasts that bounded table; per-phrase
    // sums go through the DECIMAL cast so phrase scores are
    // order-independent. Top-25 via TakeOrderedAndProject.
    "text_rake_keywords" -> { (s, dir) =>
      val stopRe = "\\b(the|a|an|and|or|of|to|in|is|are|was|be|for|" +
        "on|with|as|that|this|it|by|at|from)\\b"
      val phrases = t(s, dir, "documents")
        .select(explode(split(
          regexp_replace(lower(col("text")), stopRe, "|"), "[|]"))
          .as("p"))
        .select(trim(regexp_replace(col("p"), "[^a-z]+", " "))
          .as("phrase"))
        .filter(length(col("phrase")) > 0)
      // classic RAKE cap: ≤4-word phrases with support ≥2 — uncapped,
      // the longest stopword-free run in every document wins on length
      // alone; the cap is also what keeps the word-degree table (and
      // its broadcast) bounded at corpus scale
      val phraseCounts = phrases.groupBy(col("phrase"))
        .agg(count(lit(1)).as("occurrences"))
        .withColumn("ws", split(col("phrase"), " "))
        .withColumn("n_words", size(col("ws")))
        .filter(col("n_words") <= 4 && col("occurrences") >= 2)
      val wordRows = phraseCounts
        .select(col("occurrences"), col("n_words"),
          explode(col("ws")).as("word"))
      val wordScores = wordRows.groupBy(col("word"))
        .agg((sum(col("n_words") * col("occurrences")).cast(DoubleType) /
          sum(col("occurrences"))).as("wscore"))
      phraseCounts
        .select(col("phrase"), col("occurrences"), col("n_words"),
          explode(col("ws")).as("word"))
        .join(broadcast(wordScores), Seq("word"))
        .groupBy(col("phrase"), col("occurrences"), col("n_words"))
        .agg(round(dsum(col("wscore")), 6).as("score"))
        .orderBy(col("score").desc, col("phrase"))
        .limit(25)
    },

    // Pairwise Jensen–Shannon divergence between the sources' unigram
    // distributions — the corpus-similarity matrix a mixture designer
    // reads before setting sampling weights (two sources with near-zero
    // JSD are redundant; a high-JSD source adds diversity). One data
    // pass to (source, word) counts; everything after runs on the
    // (|sources|² × |vocab|)-sized grid — vocabulary-sized frames
    // shuffle on word (never broadcast: vocabulary grows with the
    // corpus), only the tiny pair frame broadcasts. Zero-probability
    // terms drop out of
    // the sum exactly (no smoothing — JSD is finite regardless); terms
    // are 9-dp decimal-quantized so the pair sums replay bit-identically.
    "text_source_jsd" -> { (s, dir) =>
      val c = t(s, dir, "documents")
        .select(col("source"),
          explode(split(lower(col("text")), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("n"))
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      val p = c.select(col("source"), col("word"),
        (col("n").cast(DoubleType) / sum(col("n")).over(wSrc)).as("p"))
      val srcs = c.select(col("source")).distinct()
      // only the |sources|²-row pair frame broadcasts; the vocabulary
      // and the per-source distributions are corpus-derived (Heaps'
      // law — they grow with the corpus) and flow through shuffle
      // joins keyed on word
      val pairs = srcs.select(col("source").as("src_a"))
        .join(broadcast(srcs.select(col("source").as("src_b"))),
          col("src_a") < col("src_b"))
      val grid = c.select(col("word")).distinct()
        .crossJoin(broadcast(pairs))
      val j = grid
        .join(p.select(col("source").as("src_a"),
          col("word"), col("p").as("pa")), Seq("src_a", "word"), "left")
        .join(p.select(col("source").as("src_b"),
          col("word"), col("p").as("pb")), Seq("src_b", "word"), "left")
        .select(col("src_a"), col("src_b"),
          coalesce(col("pa"), lit(0.0)).as("pa"),
          coalesce(col("pb"), lit(0.0)).as("pb"))
      j.withColumn("t",
          when(col("pa") > 0,
            col("pa") * log(lit(2.0) * col("pa") /
              (col("pa") + col("pb")))).otherwise(0.0) +
          when(col("pb") > 0,
            col("pb") * log(lit(2.0) * col("pb") /
              (col("pa") + col("pb")))).otherwise(0.0))
        .groupBy(col("src_a"), col("src_b"))
        .agg(round(sum((lit(0.5) * col("t"))
          .cast(DecimalType(18, 9))).cast(DoubleType), 6).as("jsd"))
        .orderBy(col("src_a"), col("src_b"))
    }
  )

  private def duckStop(lang: String): String =
    Stopwords(lang).map(w => s"'$w'").mkString("(", ", ", ")")

  def oracleSql: Map[String, String] = Map(
    "pipeline_funnel_report" ->
      s"""WITH d AS (SELECT doc_id, source, text,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |gq AS (SELECT doc_id, source, text,
         |    CASE WHEN len(toks) > 0
         |      AND len(toks) BETWEEN 50 AND 100000
         |      AND (CAST(list_reduce(list_transform(toks, x -> length(x)),
         |        (a,b) -> a+b) AS DOUBLE) / len(toks)) BETWEEN 3.0 AND 10.0
         |      AND (CAST(len(list_filter(toks,
         |        x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(toks)) > 0.8
         |      AND len(list_filter(toks, x -> x IN ${duckStop("en")})) >= 2
         |    THEN TRUE ELSE FALSE END AS gopher_pass
         |  FROM d),
         |s1 AS (SELECT doc_id, source, text FROM gq WHERE gopher_pass),
         |s2 AS (SELECT doc_id, source FROM (
         |    SELECT doc_id, source, row_number() OVER (
         |      PARTITION BY md5(array_to_string(list_sort(list_distinct(
         |        list_filter(string_split(text, ' '), x -> x <> ''))), ' '))
         |      ORDER BY doc_id) AS rn
         |    FROM s1) WHERE rn = 1),
         |g AS (SELECT doc_id, source, unnest(list_distinct(
         |    CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
         |    ELSE list_transform(range(1, len(toks)-6),
         |      i -> array_to_string(toks[i:i+7], ' ')) END)) AS g
         |  FROM d),
         |b AS (SELECT DISTINCT g FROM g WHERE source = 'src0'),
         |cont AS (SELECT DISTINCT doc_id FROM g JOIN b USING (g)
         |  WHERE source <> 'src0'),
         |s3 AS (SELECT s2.doc_id FROM s2 WHERE s2.source <> 'src0'
         |  AND s2.doc_id NOT IN (SELECT doc_id FROM cont)),
         |c AS (
         |  SELECT 0 AS stage, 'ingested' AS stage_name,
         |    (SELECT count(*) FROM documents) AS n_docs
         |  UNION ALL SELECT 1, 'quality_gate', (SELECT count(*) FROM s1)
         |  UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM s2)
         |  UNION ALL SELECT 3, 'decontaminated', (SELECT count(*) FROM s3))
         |SELECT stage, stage_name, n_docs,
         |  round(CASE WHEN lag(n_docs) OVER (ORDER BY stage) IS NULL
         |      OR lag(n_docs) OVER (ORDER BY stage) = 0 THEN 1.0
         |    ELSE n_docs / CAST(lag(n_docs) OVER (ORDER BY stage) AS DOUBLE)
         |    END, 6) AS frac_of_prev
         |FROM c ORDER BY stage""".stripMargin,
    "text_quality" ->
      s"""WITH d AS (SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents)
         |SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
         |  CAST(list_reduce(list_transform(toks, x -> length(x)), (a,b) -> a+b) AS DOUBLE)
         |    / len(toks) AS avg_token_len,
         |  CAST(len(list_filter(toks, x -> x IN ${duckStop("en")})) AS DOUBLE)
         |    / len(toks) AS stopword_ratio,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio
         |FROM d WHERE len(toks) > 0 ORDER BY doc_id""".stripMargin,
    "text_langid" -> {
      val scoreCols = LangOrder.map(l =>
        s"len(list_filter(toks, x -> x IN ${duckStop(l)})) AS s_$l").mkString(",\n  ")
      // same precedence chain as predictLang
      s"""WITH d AS (SELECT doc_id, lang,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |sc AS (SELECT doc_id, lang AS declared_lang,
         |  $scoreCols
         |FROM d)
         |SELECT doc_id, declared_lang, s_en, s_de, s_es, s_fr,
         |  CASE
         |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |    WHEN s_es >= s_fr THEN 'es'
         |    ELSE 'fr' END AS pred_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    },
    "text_char_entropy" ->
      """WITH d AS (SELECT doc_id, length(text) AS len,
        |    list_transform(range(1, length(text)+1),
        |      i -> substr(text, i, 1)) AS cs
        |  FROM documents WHERE length(text) > 0),
        |ch AS (SELECT doc_id, len, unnest(cs) AS ch FROM d),
        |c AS (SELECT doc_id, len, ch, count(*) AS c
        |  FROM ch GROUP BY 1, 2, 3),
        |p AS (SELECT doc_id, len, CAST(c AS DOUBLE) / len AS p FROM c)
        |SELECT doc_id, CAST(max(len) AS BIGINT) AS n_chars,
        |  count(*) AS n_distinct_chars,
        |  floor(CAST(sum(CAST(-p * ln(p) AS DECIMAL(18,6))) AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS entropy_nats
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_langid_confusion" -> {
      val scoreCols = LangOrder.map(l =>
        s"len(list_filter(toks, x -> x IN ${duckStop(l)})) AS s_$l")
        .mkString(",\n  ")
      s"""WITH d AS (SELECT doc_id, lang,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |sc AS (SELECT doc_id, lang AS declared_lang,
         |  $scoreCols
         |FROM d),
         |p AS (SELECT declared_lang,
         |  CASE
         |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |    WHEN s_es >= s_fr THEN 'es'
         |    ELSE 'fr' END AS pred_lang
         |FROM sc),
         |c AS (SELECT declared_lang, pred_lang, count(*) AS n
         |  FROM p GROUP BY 1, 2)
         |SELECT declared_lang, pred_lang, n,
         |  round(CAST(n AS DOUBLE) / sum(n)
         |    OVER (PARTITION BY declared_lang), 6) AS recall
         |FROM c ORDER BY declared_lang, pred_lang""".stripMargin
    },
    "text_langid_ngram" -> {
      val scoreCols = LangOrder.map(l =>
        s"len(list_intersect(g3, ${TrigramProfiles(l)
          .map(g => s"'$g'").mkString("[", ", ", "]")})) AS s_$l")
        .mkString(",\n  ")
      s"""WITH d AS (
         |  SELECT doc_id, lang, list_distinct(list_transform(
         |    range(1, length(text)-1), i -> substr(text, i, 3))) AS g3
         |  FROM documents),
         |sc AS (SELECT doc_id, lang AS declared_lang,
         |  $scoreCols
         |FROM d)
         |SELECT doc_id, declared_lang, s_en, s_de, s_es, s_fr,
         |  CASE
         |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |    WHEN s_es >= s_fr THEN 'es'
         |    ELSE 'fr' END AS pred_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    },
    "text_token_count" ->
      s"""SELECT doc_id,
         |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
         |  len(regexp_extract_all(text, '$BpePattern')) AS bpe_tokens,
         |  length(text) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(
        |      list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fp
        |  FROM documents),
        |g AS (SELECT fp, count(*) AS group_size FROM fp GROUP BY fp)
        |SELECT doc_id, fp.fp, group_size FROM fp JOIN g USING (fp)
        |ORDER BY doc_id""".stripMargin,
    "text_term_freq" ->
      """SELECT token, count(*) AS freq FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY freq DESC, token LIMIT 50""".stripMargin,
    "text_gopher_rules" ->
      s"""WITH d AS (SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |m AS (SELECT doc_id, len(toks) AS n_words,
         |  CAST(list_reduce(list_transform(toks, x -> length(x)), (a,b) -> a+b) AS DOUBLE)
         |    / len(toks) AS mean_word_len,
         |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
         |    / len(toks) AS alpha_word_ratio,
         |  len(list_filter(toks, x -> x IN ${duckStop("en")})) AS stopword_hits
         |FROM d WHERE len(toks) > 0)
         |SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, stopword_hits,
         |  (n_words BETWEEN 50 AND 100000)
         |    AND (mean_word_len BETWEEN 3.0 AND 10.0)
         |    AND alpha_word_ratio > 0.8
         |    AND stopword_hits >= 2 AS pass
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |t AS (SELECT doc_id, len(toks) AS n_tokens, unnest(toks) AS tok
        |  FROM d WHERE len(toks) > 1),
        |uni AS (
        |  SELECT doc_id, n_tokens, max(c) AS top_word FROM (
        |    SELECT doc_id, n_tokens, tok, count(*) AS c
        |    FROM t GROUP BY doc_id, n_tokens, tok)
        |  GROUP BY doc_id, n_tokens),
        |bg AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])) AS bg
        |  FROM d WHERE len(toks) > 1),
        |bi AS (
        |  SELECT doc_id, max(c) AS top_bigram, sum(c) AS n_bigrams FROM (
        |    SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  round(CAST(top_word AS DOUBLE) / n_tokens, 6) AS top_word_frac,
        |  round(CAST(top_bigram AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac
        |FROM uni JOIN bi USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_contamination" ->
      """WITH d AS (SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, source, unnest(list_distinct(
        |    CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks)-6),
        |      i -> array_to_string(toks[i:i+7], ' ')) END)) AS g
        |  FROM d),
        |b AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
        |SELECT doc_id, count(*) AS n_shared_grams
        |FROM g JOIN b USING (g)
        |WHERE source <> 'src0'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_rolling_hash" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(text)+1),
        |      i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df,
        |  round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
        |FROM tf JOIN dfq USING (term) CROSS JOIN n
        |ORDER BY doc_id, term""".stripMargin,
    "pipeline_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY doc_id) AS cum
        |  FROM d)
        |SELECT CAST(floor((cum - n_tokens) / 8192) AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY bin""".stripMargin,
    "pipeline_quality_gate_quantile" ->
      """WITH d AS (SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, lang,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio
        |  FROM d WHERE len(toks) > 0),
        |m AS (SELECT doc_id, lang, distinct_ratio,
        |    quantile_cont(distinct_ratio, 0.5)
        |      OVER (PARTITION BY lang) AS lang_median
        |  FROM s)
        |SELECT doc_id, lang, round(distinct_ratio, 6) AS distinct_ratio,
        |  round(lang_median, 6) AS lang_median
        |FROM m WHERE distinct_ratio > lang_median
        |ORDER BY doc_id""".stripMargin,
    "pipeline_chunk_overlap" ->
      """WITH d AS (SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    unnest(range(0, n_tokens, 64)) AS chunk_start
        |  FROM d WHERE n_tokens > 0)
        |SELECT doc_id, chunk_start // 64 AS chunk_idx, chunk_start,
        |  least(128, n_tokens - chunk_start) AS chunk_len
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "pipeline_hash_sample" ->
      """SELECT lang, source, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
        |  min(doc_id) AS first_doc
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
        |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,
    "pipeline_sample_k_per_source" ->
      """SELECT source, doc_id,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        |FROM documents
        |QUALIFY rk <= 5
        |ORDER BY source, rk""".stripMargin,
    "pipeline_weighted_sample" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        |      + 1)::DOUBLE / 4503599627370496.0 AS u
        |  FROM documents),
        |k AS (SELECT doc_id, lang, n_chars, ln(u) / n_chars AS key FROM d)
        |SELECT lang,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY key DESC, doc_id) AS INT) AS pick_rank,
        |  doc_id, n_chars, round(key, 6) AS key
        |FROM k QUALIFY pick_rank <= 5
        |ORDER BY lang, pick_rank""".stripMargin,
    "text_zipf_fit" ->
      """WITH f AS (
        |  SELECT token, count(*) AS f
        |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |    x -> x <> '')) AS token FROM documents)
        |  GROUP BY token),
        |r AS (SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r
        |  FROM f)
        |SELECT count(*) AS n_types, CAST(sum(f) AS BIGINT) AS n_tokens,
        |  round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
        |  round(regr_r2(ln(f), ln(r)), 6) AS zipf_r2
        |FROM r""".stripMargin,
    "pipeline_pack_sequences_sharded" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM d)
        |SELECT shard, CAST(floor((cum - n_tokens) / 8192) AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin,
    "pipeline_split_leakage_safe" ->
      """WITH RECURSIVE g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, length(text)-3), i -> substr(text, i, 5))) AS sh
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM g a JOIN g b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |reach(src, dst) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS doc_id, min(dst) AS comp
        |         FROM reach GROUP BY src),
        |a AS (
        |  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS rep
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |s AS (
        |  SELECT doc_id, CASE WHEN rep % 10 < 8 THEN 'train'
        |    WHEN rep % 10 = 8 THEN 'val' ELSE 'test' END AS split
        |  FROM a),
        |leaks AS (
        |  SELECT count(*) AS n_pairs,
        |    CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_leaky_safe,
        |    CAST(sum(CASE WHEN
        |        (CASE WHEN id_a % 10 < 8 THEN 'train'
        |          WHEN id_a % 10 = 8 THEN 'val' ELSE 'test' END) <>
        |        (CASE WHEN id_b % 10 < 8 THEN 'train'
        |          WHEN id_b % 10 = 8 THEN 'val' ELSE 'test' END)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_naive
        |  FROM p JOIN s sa ON p.id_a = sa.doc_id
        |         JOIN s sb ON p.id_b = sb.doc_id),
        |cnt AS (
        |  SELECT
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_train,
        |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_val,
        |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_test
        |  FROM s)
        |SELECT * FROM leaks, cnt""".stripMargin,
    "pipeline_stratified_split" ->
      """SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
        |    WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "pipeline_clean_corpus" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
        |    md5(array_to_string(list_sort(list_distinct(
        |      list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fp
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, source, n_chars, fp, len(toks) AS n_tokens
        |  FROM d
        |  WHERE len(toks) >= 20
        |    AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3),
        |u AS (
        |  SELECT * FROM q
        |  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / count(n_chars)
        |    AS avg_chars
        |FROM u GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "text_flesch_readability" ->
      """WITH d AS (SELECT lang,
        |    len(regexp_extract_all(lower(text), '[a-z]+')) AS words,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      AS sents,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syll
        |  FROM documents),
        |sc AS (SELECT lang,
        |    206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
        |      - 84.6 * (CAST(syll AS DOUBLE) / greatest(words, 1))
        |      AS score
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  round(CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(score), 6) AS flesch
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_rake_keywords" ->
      """WITH phr AS (
        |  SELECT trim(regexp_replace(p, '[^a-z]+', ' ', 'g')) AS phrase
        |  FROM documents,
        |    unnest(string_split(regexp_replace(lower(text),
        |      '\b(the|a|an|and|or|of|to|in|is|are|was|be|for|on|with|as|that|this|it|by|at|from)\b',
        |      '|', 'g'), '|')) AS u(p)
        |  WHERE len(trim(regexp_replace(p, '[^a-z]+', ' ', 'g'))) > 0),
        |pc0 AS (
        |  SELECT phrase, count(*) AS occurrences,
        |    string_split(phrase, ' ') AS ws,
        |    len(string_split(phrase, ' ')) AS n_words
        |  FROM phr GROUP BY 1),
        |pc AS (SELECT * FROM pc0
        |  WHERE n_words <= 4 AND occurrences >= 2),
        |wsc AS (
        |  SELECT word, CAST(sum(n_words * occurrences) AS DOUBLE)
        |      / sum(occurrences) AS wscore
        |  FROM (SELECT occurrences, n_words, w AS word
        |        FROM pc, unnest(ws) AS t(w))
        |  GROUP BY 1),
        |ph AS (
        |  SELECT phrase, occurrences, n_words, w AS word
        |  FROM pc, unnest(ws) AS t(w))
        |SELECT phrase, occurrences, n_words,
        |  round(CAST(sum(CAST(wscore AS DECIMAL(18,6))) AS DOUBLE), 6)
        |    AS score
        |FROM ph JOIN wsc USING (word)
        |GROUP BY 1, 2, 3
        |ORDER BY score DESC, phrase LIMIT 25""".stripMargin,
    "text_source_jsd" ->
      """WITH w AS (
        |  SELECT source, u.w AS word FROM documents,
        |    unnest(string_split(lower(text), ' ')) AS u(w)
        |  WHERE len(u.w) > 0),
        |c AS (SELECT source, word, count(*) AS n FROM w GROUP BY 1, 2),
        |p AS (SELECT source, word,
        |    CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY source) AS p
        |  FROM c),
        |grid AS (
        |  SELECT s1.source AS src_a, s2.source AS src_b, u.word
        |  FROM (SELECT DISTINCT source FROM c) s1
        |  JOIN (SELECT DISTINCT source FROM c) s2
        |    ON s1.source < s2.source
        |  CROSS JOIN (SELECT DISTINCT word FROM c) u),
        |j AS (
        |  SELECT g.src_a, g.src_b,
        |    coalesce(pa.p, 0) AS pa, coalesce(pb.p, 0) AS pb
        |  FROM grid g
        |  LEFT JOIN p pa ON pa.source = g.src_a AND pa.word = g.word
        |  LEFT JOIN p pb ON pb.source = g.src_b AND pb.word = g.word),
        |terms AS (
        |  SELECT src_a, src_b,
        |    CASE WHEN pa > 0
        |      THEN pa * ln(2 * pa / (pa + pb)) ELSE 0 END
        |    + CASE WHEN pb > 0
        |      THEN pb * ln(2 * pb / (pa + pb)) ELSE 0 END AS t
        |  FROM j)
        |SELECT src_a, src_b,
        |  round(CAST(sum(CAST(0.5 * t AS DECIMAL(18,9))) AS DOUBLE), 6)
        |    AS jsd
        |FROM terms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
