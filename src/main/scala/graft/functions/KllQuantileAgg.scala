package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (DataSketches KLL) as first-class
  * aggregates — the quantile analogue of the `hll_sketch_agg` /
  * `hll_union_agg` pair Spark ships for distinct counts, which it does
  * NOT ship for quantiles (`percentile_approx` can only re-scan raw
  * rows; its internal QuantileSummaries never surfaces as a column).
  *
  * Why this matters at 100 TB: build per-(dimension, hour) KLL sketches
  * ONCE in the hourly rollup job, persist the kilobyte-sized binaries,
  * and answer any p50/p95/p99 over any dimension slice by MERGING
  * sketches — never re-scanning raw events. KLL is fully mergeable with
  * a priori error bounds (~1.7% rank error at k=200), so rollup cells
  * compose exactly like HLL distinct counts.
  *
  * [[KllSketchAgg]]  double column → serialized sketch (binary)
  * [[KllMergeAgg]]   binary sketches → merged sketch (binary)
  * [[KllQuantiles]]  (sketch, array<double> ranks) → array<double>
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_agg requires a double input, got $t")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Union of serialized KLL sketches — the rollup-merge aggregate. The
  * buffer starts empty at the same k, so merging preserves each input
  * sketch's accuracy floor (KLL merge degrades gracefully to the
  * smaller k of the two operands). */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge requires a binary (serialized KLL) input, got $t")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** Quantile extraction from a serialized KLL sketch: one sketch decode
  * per ROW (post-aggregation — rollup outputs, never raw data), so
  * CodegenFallback costs nothing measurable; inclusive search criteria
  * matches DuckDB's quantile_cont rank convention closely enough for
  * tolerance audits. Empty sketch → null. */
case class KllQuantiles(sketch: Expression, ranks: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, ranks)
  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, ranks.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_kll_quantiles requires (binary, array<double>), got ($s, $r)")
    }
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantiles"

  override def eval(input: InternalRow): Any = {
    val bytes = sketch.eval(input)
    val rs = ranks.eval(input)
    if (bytes == null || rs == null) return null
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val arr = rs.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(arr.map(r => sk.getQuantile(r)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(sketch = newChildren(0), ranks = newChildren(1))
}
