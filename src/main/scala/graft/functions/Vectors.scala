package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `ArrayType(FloatType|DoubleType)` embedding columns.
  *
  * `dot` is a custom Catalyst expression with whole-stage codegen
  * ([[DotProduct]]) — a strict left-to-right primitive loop. The DuckDB
  * oracle mirrors the same order with
  * `list_reduce(list_transform(...), (x,y) -> x+y)`, giving bit-identical
  * doubles on both engines (DuckDB's builtin `list_cosine_similarity`
  * accumulates in float32 and does NOT match).
  *
  * For pairwise workloads, precompute [[norm]] once per vector and use
  * `dot(a,b) / (norm_a * norm_b)` — same value as [[cosine]], one dot
  * per pair instead of three.
  */
object Vectors {

  /** Cast an embedding array to DOUBLE elements. */
  def toDouble(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Dot product: codegen'd strict left fold (see [[DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (higher-order form; fine off the hot path). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
}
