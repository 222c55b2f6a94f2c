package graft.ops

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.{CharShingles, WordShingles}

/** Shared text primitives for the dedup / text-analysis operators.
  * Tokenization stays a codegen'd built-in; shingling uses native
  * single-pass expressions (the composed higher-order-function
  * formulation pays interpreted lambda dispatch per shingle per token —
  * see graft.functions.TextExpressions). The HOF variants are kept for
  * the equivalence spec.
  */
object Text {

  /** Whitespace tokens, empties dropped.
    * DuckDB: `list_filter(string_split(text,' '), x -> x <> '')`. */
  def tokens(text: Column): Column =
    filter(split(text, " "), x => x =!= "")

  /** Word w-shingles: overlapping windows of `w` tokens joined by a
    * space (single-pass native expression). */
  def wordShingles(text: Column, w: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), w))

  /** Character n-grams of the raw text (single-pass native expression). */
  def charShingles(text: Column, n: Int): Column =
    GraftBridge.column(CharShingles(GraftBridge.expression(text), n))

  /** Sorted distinct xxhash64 values of the character n-grams — the
    * fused form of `array_distinct(transform(charShingles(text, n),
    * xxhash64))` for hash-set consumers (containment dedup). */
  def charShingleHashes(text: Column, n: Int): Column =
    GraftBridge.column(
      graft.functions.CharShingleHashes(GraftBridge.expression(text), n))

  /** Reference HOF formulations — semantics oracle for the native
    * expressions above (asserted equal in OpsSpec). */
  def wordShinglesHof(text: Column, w: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(w)))))
  }

  def charShinglesHof(text: Column, n: Int): Column =
    when(length(text) < n, array(text))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** Canonical content fingerprint: md5 over the sorted distinct token
    * set. DuckDB: `md5(array_to_string(list_sort(list_distinct(...)),' '))`. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))
}
