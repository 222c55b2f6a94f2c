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
    }
  )

  private def duckStop(lang: String): String =
    Stopwords(lang).map(w => s"'$w'").mkString("(", ", ", ")")

  def oracleSql: Map[String, String] = Map(
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
        |GROUP BY token ORDER BY freq DESC, token LIMIT 50""".stripMargin
  )
}
