package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Gram (scatter) matrix of a vector column as ONE single-pass
  * aggregate: buffer = d×d accumulators of Σ_rows round(xᵢ·xⱼ·10⁶) —
  * exact integer micro-units, so partial/final merge order cannot
  * change the result and the matrix is bit-identical across runs and
  * partitionings (the property the whole oracle surface is built on;
  * same micro-unit trick as `sim_label_centroids`).
  *
  * Fed CENTERED vectors, the result is n·Cov in micro-units — the
  * input to PCA. The d² blowup happens INSIDE the buffer (one 32 KB
  * long array per partition for d = 64), never as rows: the
  * alternative posexplode-pairs formulation multiplies the corpus by
  * d² on the wire, this shuffles one buffer per partition. Map-side
  * partial combine + elementwise-add merge, standard
  * TypedImperativeAggregate contract.
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram requires array<double>, got $t")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData].toDoubleArray()
      require(a.length == dim,
        s"graft_gram: expected dim $dim, got ${a.length}")
      var i = 0
      while (i < dim) {
        val ci = a(i)
        val base = i * dim
        var j = 0
        while (j < dim) {
          buf(base + j) += math.round(ci * a(j) * 1e6)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * buf.length)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](dim * dim)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
