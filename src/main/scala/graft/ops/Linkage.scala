package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Record linkage / entity resolution: blocked fuzzy matching by edit
  * distance, plus entity clustering over the match graph. Absent from
  * the reference (its 642-line ingest script has no joins at all —
  * SURVEY §2c) but core to data cleaning at corpus scale: the same
  * supplier/product/author arrives spelled three ways and must become
  * one entity before any aggregate over it means anything.
  *
  * Scale shape: classic blocking. Candidate pairs come from an
  * equi-join on a user-chosen blocking key (here: brand), never from a
  * cross join, so the plan is one shuffle on the key; within-block
  * pairing is quadratic BY DESIGN (record-linkage blocks are
  * dimension-bounded — brands, zip codes, name initials), and a
  * lossless length pigeonhole (levenshtein(a,b) >= |len(a)-len(b)|)
  * prunes most in-block pairs before the edit-distance evaluation.
  * Blocking-key recall is the user's modelling choice: matches that
  * disagree on the key are out of scope, exactly as in the published
  * record-linkage literature (Fellegi–Sunter blocking).
  */
object Linkage {

  /** Jaro–Winkler match floor: 0.9 keeps transposition/prefix-typo
    * matches while excluding mere same-vocabulary neighbors. */
  val JaroThreshold = 0.9

  /** Per-block contributor budget for the Jaro–Winkler scorer. Unlike
    * the Levenshtein path (whose lossless length pigeonhole prunes
    * in-block pairs before the scorer), JW has no lossless per-pair
    * bound strong enough to tame a DIMENSION-BOUNDED blocking key:
    * brand has ~25 values at every scale factor, so block size grows
    * linearly with the corpus and in-block pairs quadratically — at
    * 100 TB one block is an unboundable task. The cap is the
    * [[Scale.wedgeGovernor]] move: blocks within budget are untouched
    * (bit-identical results — 1024 sits above every block the test
    * SFs produce, so the oracle is unchanged), hotter blocks keep a
    * deterministic ~cap-sized hash sample of contributors, bounding
    * any block's pair volume at ~C(1024,2) ≈ 524k scored pairs.
    * `audit_jw_cap` reports what the governor would truncate; zero at
    * every test SF is its oracle assertion. */
  val JwBlockCap = 1024

  /** Candidate pairs within each block whose edit distance is ≤ maxDist.
    * `id` must be unique; pairs are emitted once (id_a < id_b). The
    * length filter is lossless for Levenshtein, so the result equals
    * the unpruned within-block quadratic scan. The distance itself is
    * computed ONCE per length-surviving pair with the threshold-banded
    * form (O(maxDist·n) banded DP that bails out early, returning −1
    * past the threshold) instead of a full O(n²) matrix in the join
    * predicate plus a second one in the projection — 6.7 s → well
    * under half that at sf0.1. */
  def fuzzyPairs(rows: DataFrame, id: String, name: String,
      block: String, maxDist: Int): DataFrame = {
    // spread the PROBE side: the block side of the equi-join is small
    // enough that Spark broadcasts it, so the whole quadratic in-block
    // pair scan executes inside the probe scan's tasks — and a
    // dimension table arrives as ONE parquet partition (the r14 10×
    // probe read 34 s at 0.0 MB shuffle: ~800M pair evaluations on a
    // single core). One round-robin exchange of the probe rows (the
    // smallest frame here) fans the scan out; under a shuffle join
    // the extra exchange is probe-sized noise.
    // Deliberately NOT hinting broadcast on the b side (r14 advice
    // considered): b is the SAME corpus-derived frame as a — a
    // self-join, not a dim⋈fact — so a forced broadcast is exactly
    // the 100 TB hazard the stats-driven planner avoids when the
    // frame outgrows the threshold. If stats push the join to
    // sort-merge, both sides reshuffle by __blk and this exchange is
    // wasted — an accepted probe-sized cost, traded against a hint
    // that would pin an unbounded frame into executor memory.
    val a = rows.select(col(id).as("id_a"), col(name).as("name_a"),
        col(block).as("__blk"))
      .repartition(rows.sparkSession.sparkContext.defaultParallelism)
    val b = rows.select(col(id).as("id_b"), col(name).as("name_b"),
      col(block).as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** Blocked Jaro–Winkler candidate pairs at similarity ≥ `tau`, pairs
    * emitted once (id_a < id_b), scored by the codegen'd
    * [[graft.functions.JaroWinkler]] expression (pinned to DuckDB's
    * jaro_winkler_similarity semantics so scores are oracle-checked).
    * Two governors sit between the block equi-join and the scorer:
    *
    *  1. a LOSSLESS length-ratio prune. With prefix scale p = 0.1 and
    *     prefix length ≤ 4, JW = J + ℓp(1−J) ≤ 0.6·J + 0.4, and Jaro
    *     itself is bounded by J ≤ (2 + r)/3 where r = min(|a|,|b|) /
    *     max(|a|,|b|) (m ≤ min matches cap the m/max term at r; the
    *     other two terms are each ≤ 1). So JW ≥ τ forces
    *     r ≥ 5τ − 4 — at τ = 0.9, no pair whose longer name is more
    *     than twice the shorter can reach the floor, and the scorer
    *     never runs on it. (Both-empty pairs pass the filter — 0 ≥ 0 —
    *     so the bound stays lossless on degenerate input.)
    *  2. the [[Scale.wedgeGovernor]] per-block contributor cap (see
    *     [[JwBlockCap]]): map-side hash sample, no extra shuffle — the
    *     block-size frame is dimension-bounded by the blocking
    *     contract and broadcasts.
    */
  def jaroPairs(rows: DataFrame, id: String, name: String, block: String,
      tau: Double = JaroThreshold, cap: Int = JwBlockCap): DataFrame = {
    val recs = rows.select(col(id).as("rid"), col(name).as("rname"),
      col(block).as("__blk"))
    val sizes = recs.groupBy(col("__blk")).agg(count(lit(1)).as("__bn"))
    val governed = recs.join(broadcast(sizes), Seq("__blk"))
      .filter(Scale.wedgeGovernor(col("__blk"), col("rid"), col("__bn"), cap))
      .select(col("__blk"), col("rid"), col("rname"))
    // probe side spread for the same single-task reason as
    // [[fuzzyPairs]] (the governed frame inherits the 1-partition
    // dimension scan; the JW scorer is the query's entire cost)
    val a = governed.select(col("rid").as("id_a"),
        col("rname").as("name_a"), col("__blk"))
      .repartition(rows.sparkSession.sparkContext.defaultParallelism)
    val b = governed.select(col("rid").as("id_b"),
      col("rname").as("name_b"), col("__blk"))
    // the length-ratio prune lives INSIDE the thresholded scorer
    // ([[graft.functions.JaroWinklerGte]]), not in a Filter: the pair
    // stream is memory-bandwidth-bound, so extra per-pair columns or
    // filter operators cost more than the scoring they save (measured
    // 12.4–14.8 s for the filter forms vs 8.5 s at the 3× probe)
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", org.apache.spark.sql.GraftBridge.column(
        graft.functions.JaroWinklerGte(
          org.apache.spark.sql.GraftBridge.expression(col("name_a")),
          org.apache.spark.sql.GraftBridge.expression(col("name_b")), tau)))
      .filter(col("jw") >= tau)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        round(col("jw"), 6).as("jw"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // brand-blocked fuzzy part-name matches at edit distance ≤ 2:
    // one shuffle on the blocking key, exact levenshtein verify
    "link_fuzzy_pairs" -> { (s, dir) =>
      fuzzyPairs(t(s, dir, "part"), "p_partkey", "p_name", "p_brand", 2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Jaro–Winkler scored variant of the blocked fuzzy join: the
    // record-linkage scorer that forgives transpositions and rewards
    // shared prefixes where Levenshtein charges full price. Same
    // blocking shape (one shuffle on brand), but governed — see
    // [[jaroPairs]] for the lossless length-ratio prune and the
    // per-block contributor cap that keep a dimension-bounded
    // blocking key from going quadratic at corpus scale.
    "link_jaro_pairs" -> { (s, dir) =>
      jaroPairs(t(s, dir, "part"), "p_partkey", "p_name", "p_brand")
        .orderBy(col("id_a"), col("id_b"))
    },

    // governor audit for the JW linkage blocks: block census plus how
    // many in-block pairs the contributor cap would drop. Zero at
    // every test SF (max block ≈ 800 at sf0.1 vs cap 1024) — and
    // exactly-zero is the oracle assertion that the governor is
    // semantically invisible at these scales, the audit_wedge_cap
    // convention.
    "audit_jw_cap" -> { (s, dir) =>
      val cap = JwBlockCap.toLong
      val capPairs = lit(cap * (cap - 1) / 2)
      t(s, dir, "part")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("bn"))
        .agg(count(lit(1)).as("n_blocks"),
          max(col("bn")).as("max_block"),
          coalesce(sum(when(col("bn") > cap, 1L)), lit(0L))
            .as("n_blocks_capped"),
          (sum(col("bn") * (col("bn") - 1)) / lit(2))
            .cast(org.apache.spark.sql.types.LongType).as("pairs_total"),
          coalesce(sum(when(col("bn") > cap,
              (col("bn") * (col("bn") - 1) / lit(2))
                .cast(org.apache.spark.sql.types.LongType) - capPairs)),
            lit(0L)).as("pairs_dropped"))
    },

    // entity resolution end-to-end: fuzzy match graph → connected
    // components (shared O(log n) pointer-jumping machinery from
    // Dedup) → each part labeled with its entity id; the canonical
    // record is the minimum id, as in dedup_components
    "link_fuzzy_clusters" -> { (s, dir) =>
      val pairs = fuzzyPairs(t(s, dir, "part"),
        "p_partkey", "p_name", "p_brand", 2)
      Dedup.components(pairs, "id_a", "id_b")
        .select(col("id").as("p_partkey"), col("comp").as("entity"),
          (col("comp") === col("id")).as("canonical"))
        .orderBy(col("p_partkey"))
    },

    // golden-record construction (the MDM survivorship step after
    // clustering): per multi-member entity, field-wise survivorship —
    // id = min member, name = longest (lexicographic tie-break),
    // price = mean over members — so downstream joins see ONE record
    // per real-world entity. One |parts|-sized join of the cluster
    // labels back to attributes + a per-entity agg; the argmax name
    // rides a (length, name) struct max, no window needed.
    "link_golden_record" -> { (s, dir) =>
      val p = t(s, dir, "part")
      val pairs = fuzzyPairs(p, "p_partkey", "p_name", "p_brand", 2)
      val comp = Dedup.components(pairs, "id_a", "id_b")
      p.join(comp, col("p_partkey") === col("id"), "inner")
        .groupBy(col("comp").as("entity"))
        .agg(count(lit(1)).as("n_members"),
          min(col("p_partkey")).as("canonical_id"),
          max(struct(length(col("p_name")).as("len"),
            col("p_name").as("name"))).getField("name").as("golden_name"),
          round(davg(col("p_retailprice")), 6).as("mean_price"))
        .filter(col("n_members") >= 2)
        .orderBy(col("entity"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "link_fuzzy_pairs" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "link_jaro_pairs" ->
      s"""SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
         |  a.p_name AS name_a, b.p_name AS name_b,
         |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
         |FROM part a JOIN part b
         |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         |WHERE jaro_winkler_similarity(a.p_name, b.p_name)
         |  >= $JaroThreshold
         |ORDER BY id_a, id_b""".stripMargin,
    "audit_jw_cap" ->
      s"""WITH b AS (SELECT p_brand, count(*) AS bn
         |  FROM part GROUP BY p_brand)
         |SELECT count(*) AS n_blocks, max(bn) AS max_block,
         |  CAST(coalesce(sum(CASE WHEN bn > $JwBlockCap
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_blocks_capped,
         |  CAST(sum(bn * (bn - 1)) / 2 AS BIGINT) AS pairs_total,
         |  CAST(coalesce(sum(CASE WHEN bn > $JwBlockCap
         |    THEN CAST(bn * (bn - 1) / 2 AS BIGINT)
         |      - ${JwBlockCap.toLong * (JwBlockCap - 1) / 2}
         |    END), 0) AS BIGINT) AS pairs_dropped
         |FROM b""".stripMargin,
    // same closure + field-wise survivorship per multi-member entity
    "link_golden_record" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
        |  FROM part a JOIN part b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |reach(src, dst) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |lab AS (SELECT src AS p_partkey, min(dst) AS entity
        |  FROM reach GROUP BY src),
        |mem AS (SELECT l.entity, pt.p_partkey, pt.p_name, pt.p_retailprice
        |  FROM part pt JOIN lab l USING (p_partkey)),
        |best AS (SELECT entity, p_name,
        |    row_number() OVER (PARTITION BY entity
        |      ORDER BY length(p_name) DESC, p_name DESC) AS rn
        |  FROM mem)
        |SELECT m.entity, count(*) AS n_members,
        |  min(m.p_partkey) AS canonical_id,
        |  max(b.p_name) AS golden_name,
        |  round(CAST(sum(CAST(m.p_retailprice AS DECIMAL(18,6)))
        |    AS DOUBLE) / count(m.p_retailprice), 6) AS mean_price
        |FROM mem m JOIN best b ON b.entity = m.entity AND b.rn = 1
        |GROUP BY m.entity HAVING count(*) >= 2
        |ORDER BY m.entity""".stripMargin,
    // reachability closure over the fuzzy match graph (recursive CTE),
    // entity = min reachable id — mirrors the dedup_components oracle
    "link_fuzzy_clusters" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
        |  FROM part a JOIN part b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |reach(src, dst) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        |SELECT src AS p_partkey, min(dst) AS entity,
        |  min(dst) = src AS canonical
        |FROM reach GROUP BY src ORDER BY p_partkey""".stripMargin
  )
}
