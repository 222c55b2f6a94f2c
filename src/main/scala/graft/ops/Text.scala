package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared text primitives for the dedup / text-analysis operators.
  * Everything here is built from codegen'd built-ins (no UDFs) and has a
  * 1:1 DuckDB formulation so oracle queries stay portable.
  */
object Text {

  /** Whitespace tokens, empties dropped.
    * DuckDB: `list_filter(string_split(text,' '), x -> x <> '')`. */
  def tokens(text: Column): Column =
    filter(split(text, " "), x => x =!= "")

  /** Word w-shingles: overlapping windows of `w` tokens joined by a
    * space. One pass over the token array via transform+slice. */
  def wordShingles(text: Column, w: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(w)))))
  }

  /** Character n-grams of the raw text (`Column.substr` accepts column
    * positions; sequence is 1-based here).
    * DuckDB: `list_transform(range(1, len-n+2), i -> text[i:i+n-1])`. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array(text))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** Canonical content fingerprint: md5 over the sorted distinct token
    * set. DuckDB: `md5(array_to_string(list_sort(list_distinct(...)),' '))`. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))
}
