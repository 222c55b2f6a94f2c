package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable SET-ALGEBRA sketches (DataSketches Theta) as first-class
  * aggregates — completing the mergeable-sketch family next to distinct
  * counts (`hll_sketch_agg`, `q_hll_rollup`) and quantiles
  * (KllQuantileAgg, `q_kll_rollup`). HLL answers |A| but can never
  * answer |A ∩ B|; Theta sketches are closed under union, intersection,
  * and difference, which is exactly what cross-corpus curation needs:
  * "how much does source A overlap source B" over billions of document
  * fingerprints, from kilobyte summaries, without ever joining the two
  * corpora.
  *
  * Why this matters at 100 TB: build one Theta sketch per corpus slice
  * (source, snapshot, language …) in the slice's own ingest job, persist
  * the binaries, and answer ANY pairwise overlap/Jaccard question later
  * by sketch set-algebra — |slices|² work on kilobytes instead of a
  * corpus×corpus join. Below ~4k distinct items per slice (lgK=12) the
  * sketch is in exact mode and estimates are exact; beyond that relative
  * error is ~1/√k ≈ 1.6%, measured per round by
  * `audit_theta_overlap_error` against the exact overlap matrix.
  *
  * [[ThetaSketchAgg]]  string column → serialized compact sketch
  * [[ThetaUnionAgg]]   binary sketches → merged sketch (rollup-merge)
  * [[ThetaOverlap]]    (sketch, sketch) → [est_a, est_b, union, inter]
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_agg requires a string input, got $t")
  }

  // the buffer is a Union (an UpdateSketch cannot absorb other
  // sketches); raw items stream into it exactly like into a plain
  // update sketch
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult); b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Union of serialized Theta sketches — the rollup-merge aggregate
  * (per-slice sketches → per-group sketches, never a raw re-scan). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_union"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_union requires a binary (serialized theta) input, got $t")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(CompactSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult); b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** Set-algebra estimates from two serialized Theta sketches:
  * [|A|, |B|, |A ∪ B|, |A ∩ B|] as doubles. Runs once per GROUP PAIR
  * (post-aggregation, |slices|²-bounded rows), so CodegenFallback costs
  * nothing measurable. Jaccard and containment derive in plain SQL:
  * inter/union, inter/|A|. */
case class ThetaOverlap(a: Expression, b: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(a, b)
  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (x, y) => TypeCheckResult.TypeCheckFailure(
        s"graft_theta_overlap requires (binary, binary), got ($x, $y)")
    }
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_theta_overlap"

  override def eval(input: InternalRow): Any = {
    val ab = a.eval(input); val bb = b.eval(input)
    if (ab == null || bb == null) return null
    val sa = Sketches.wrapSketch(Memory.wrap(ab.asInstanceOf[Array[Byte]]))
    val sb = Sketches.wrapSketch(Memory.wrap(bb.asInstanceOf[Array[Byte]]))
    val un = SetOperation.builder().buildUnion()
    un.union(sa); un.union(sb)
    val in = SetOperation.builder().buildIntersection()
    in.intersect(sa); in.intersect(sb)
    new GenericArrayData(Array(sa.getEstimate, sb.getEstimate,
      un.getResult.getEstimate, in.getResult.getEstimate))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaOverlap =
    copy(a = newChildren(0), b = newChildren(1))
}
