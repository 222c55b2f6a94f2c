package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over `ArrayType(FloatType|DoubleType)` embedding columns,
  * built from Spark's codegen'd higher-order functions — no UDFs, so the
  * expressions stay inside Catalyst and distribute trivially.
  *
  * Determinism contract: `dot` is a strict left fold in element order
  * (`aggregate`), and every element is cast to DOUBLE first — the DuckDB
  * oracle mirrors the same order with
  * `list_reduce(list_transform(...), (x,y) -> x+y)`, giving bit-identical
  * doubles on both engines (the builtin `list_cosine_similarity`
  * accumulates in float32 and does NOT match).
  */
object Vectors {

  /** Cast an embedding array to DOUBLE elements. */
  def toDouble(a: Column): Column = transform(a, x => x.cast(DoubleType))

  /** Dot product: strict left fold over zip_with products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (same fold discipline). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
}
