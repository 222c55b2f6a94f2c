package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharShingleHashes, CharShingles, DotProduct, GramAgg, IdnHostAscii, JaroWinkler, JaroWinklerGte, LshBuckets, MinHashSig, RollingHash, SimHashAgg, TopKTokens, WordShingles}

/** The custom-expression SQL surface, shared by both registration
  * paths: cluster-wide via `--conf spark.sql.extensions=graft.
  * GraftExtensions`, or in-session via
  * [[graft.ops.Scale.registerSqlFunctions]]. */
object GraftFunctions {

  /** Positive integral literal argument (shingle sizes must be plan-time
    * constants — they fix the output shape). */
  private def intArg(fn: String, exprs: Seq[Expression], i: Int): Int = {
    require(exprs.length > i, s"$fn expects ${i + 1} arguments")
    val e = exprs(i)
    require(e.foldable, s"$fn: argument ${i + 1} must be a literal")
    val v = e.eval() match {
      case x: Int => x
      case x: Long => math.toIntExact(x)
      case x: Short => x.toInt
      case x: Byte => x.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: integral literal expected for argument ${i + 1}, got $other")
    }
    require(v > 0, s"$fn: size must be positive, got $v")
    v
  }

  private def two(fn: String, exprs: Seq[Expression]): Unit =
    require(exprs.length == 2, s"$fn expects exactly 2 arguments, got ${exprs.length}")

  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct], exprs => {
      two("graft_dot", exprs); DotProduct(exprs(0), exprs(1))
    }),
    ("graft_word_shingles", classOf[WordShingles], exprs => {
      two("graft_word_shingles", exprs)
      WordShingles(exprs(0), intArg("graft_word_shingles", exprs, 1))
    }),
    ("graft_char_shingles", classOf[CharShingles], exprs => {
      two("graft_char_shingles", exprs)
      CharShingles(exprs(0), intArg("graft_char_shingles", exprs, 1))
    }),
    ("graft_char_shingle_hashes", classOf[CharShingleHashes], exprs => {
      two("graft_char_shingle_hashes", exprs)
      CharShingleHashes(exprs(0), intArg("graft_char_shingle_hashes", exprs, 1))
    }),
    ("graft_rolling_hash", classOf[RollingHash], exprs => {
      require(exprs.length == 1,
        s"graft_rolling_hash expects 1 argument, got ${exprs.length}")
      RollingHash(exprs(0))
    }),
    ("graft_minhash", classOf[MinHashSig], exprs => {
      two("graft_minhash", exprs)
      MinHashSig(exprs(0), intArg("graft_minhash", exprs, 1))
    }),
    ("graft_lsh_buckets", classOf[LshBuckets], exprs => {
      require(exprs.length == 4,
        s"graft_lsh_buckets expects 4 arguments, got ${exprs.length}")
      LshBuckets(exprs(0), intArg("graft_lsh_buckets", exprs, 1),
        intArg("graft_lsh_buckets", exprs, 2),
        intArg("graft_lsh_buckets", exprs, 3))
    }),
    // aggregates: the analyzer wraps AggregateFunction builders in an
    // AggregateExpression during resolution
    ("graft_simhash", classOf[SimHashAgg], exprs => {
      require(exprs.length == 1,
        s"graft_simhash expects 1 argument, got ${exprs.length}")
      SimHashAgg(exprs(0))
    }),
    ("graft_topk_tokens", classOf[TopKTokens], exprs => {
      two("graft_topk_tokens", exprs)
      TopKTokens(exprs(0), intArg("graft_topk_tokens", exprs, 1))
    }),
    ("graft_gram", classOf[GramAgg], exprs => {
      two("graft_gram", exprs)
      GramAgg(exprs(0), intArg("graft_gram", exprs, 1))
    }),
    ("graft_jaro_winkler", classOf[JaroWinkler], exprs => {
      two("graft_jaro_winkler", exprs)
      JaroWinkler(exprs(0), exprs(1))
    }),
    ("graft_idn_host_ascii", classOf[IdnHostAscii], exprs => {
      require(exprs.length == 1,
        s"graft_idn_host_ascii expects 1 argument, got ${exprs.length}")
      IdnHostAscii(exprs(0))
    }),
    // thresholded variant: exact score when >= tau is reachable, 0.0
    // when the lossless length-ratio bound proves it is not — only
    // meaningful under a `>= tau` filter (tau is a plan-time literal,
    // like the levenshtein threshold form)
    ("graft_jaro_winkler_gte", classOf[JaroWinklerGte], exprs => {
      require(exprs.length == 3,
        s"graft_jaro_winkler_gte expects 3 arguments, got ${exprs.length}")
      val t = exprs(2)
      require(t.foldable,
        "graft_jaro_winkler_gte: tau must be a literal")
      val tau = t.eval() match {
        case d: Double => d
        case f: Float => f.toDouble
        case x: java.math.BigDecimal => x.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case other => throw new IllegalArgumentException(
          s"graft_jaro_winkler_gte: numeric literal tau expected, got $other")
      }
      JaroWinklerGte(exprs(0), exprs(1), tau)
    }))
}

/** Session-extension entry point: deploy with
  * `--conf spark.sql.extensions=graft.GraftExtensions` to make the
  * custom Catalyst expressions callable from SQL on every session of a
  * cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, cls, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }
    // domain rewrites + the custom physical operator, so the
    // cluster-wide extensions path carries the FULL surface (the
    // in-session path is Scale.registerSqlFunctions +
    // plans.TopKPerKey.register)
    e.injectOptimizerRule(_ => graft.plans.LevenshteinPigeonhole)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
