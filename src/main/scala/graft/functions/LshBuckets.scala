package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `tables` random-hyperplane LSH bucket ids of a DOUBLE vector in
  * ONE expression: `tables × bits` sign-of-dot-product bits computed by
  * a tight loop over a precomputed plane matrix.
  *
  * The composed formulation (`tables × bits` separate DotProduct
  * expressions over array literals) was semantically identical but
  * expanded into a codegen unit whose Janino compile time dominated
  * the LSH query. Here the plane matrix is one broadcast-referenced
  * `double[]` and the generated code is a 3-line nested loop.
  *
  * Hyperplane component (tb, b, i) = murmur3_productHash((tb,b,i),
  * seed 42) / Int.MaxValue ∈ [-1, 1) — IDENTICAL to
  * [[graft.ops.Similarity.hyperplanes]], so bucket ids (and therefore
  * LSH candidates/results) are unchanged; bucket bit b is set iff the
  * dot product is strictly positive.
  */
case class LshBuckets(child: Expression, tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  /** Flat [tables*bits*dim] plane matrix; deterministic, built once per
    * executor (the case class is serialized without it). */
  @transient private lazy val planes: Array[Double] = LshBuckets.planes(tables, bits, dim)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    new GenericArrayData(LshBuckets.compute(planes, tables, bits, dim, v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.LshBuckets.compute(
         |    $planesRef, $tables, $bits, $dim, $v));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Same formula as Similarity.hyperplanes, flattened. */
  def planes(tables: Int, bits: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var tb = 0
    while (tb < tables) {
      var b = 0
      while (b < bits) {
        var i = 0
        while (i < dim) {
          val h = scala.util.hashing.MurmurHash3.productHash((tb, b, i), seed = 42)
          out((tb * bits + b) * dim + i) = h.toDouble / Int.MaxValue
          i += 1
        }
        b += 1
      }
      tb += 1
    }
    out
  }

  /** Shared by eval and codegen: bucket id per table. The vector MUST
    * match the plane dimensionality — silently bucketing on a prefix
    * (the old min(dim, |v|) truncation) collapses recall in the
    * function advertised as the recommended scale path while precision
    * stays 1.0, so nothing would ever error downstream. */
  def compute(planes: Array[Double], tables: Int, bits: Int, dim: Int,
      v: ArrayData): Array[Int] = {
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"graft_lsh_buckets: vector has ${v.numElements()} components but " +
        s"hyperplanes were built for dim=$dim — pass the embedding " +
        "dimensionality explicitly")
    val n = dim
    val out = new Array[Int](tables)
    var tb = 0
    while (tb < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val off = (tb * bits + b) * dim
        var acc = 0.0
        var i = 0
        while (i < n) { acc += planes(off + i) * v.getDouble(i); i += 1 }
        if (acc > 0) bucket |= (1 << b)
        b += 1
      }
      out(tb) = bucket
      tb += 1
    }
    out
  }
}
