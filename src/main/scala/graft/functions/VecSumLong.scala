package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Elementwise sum aggregate over `array<bigint>` columns — THE
  * building block of distributed k-means (and any centroid/gradient
  * accumulation): each map task folds its partition's vectors into
  * one local sum vector, so the exchange carries O(partitions × dim)
  * longs instead of the corpus. The dimensionality is taken from the
  * first vector seen; a later vector of a different length fails
  * loudly, and zero-length vectors are rejected outright (same
  * ragged-data contract as `dot_product_l` — silent truncation or
  * skipping would corrupt every mean downstream).
  *
  * Why not `aggregate(collect_list(...))` or an explode + per-dim
  * groupBy: collect_list materializes every vector in the reducer
  * (no partial reduction), and the explode shape multiplies the
  * shuffle by the dimensionality. This buffer is one long[dim] per
  * group per task.
  *
  * Empty groups evaluate to NULL (matching SUM's no-input behavior).
  */
case class VecSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes {

  // empty array = "no input yet" sentinel; zero-length INPUT vectors
  // are rejected below (they are malformed embedding data, and
  // accepting them would make the sentinel ambiguous — a dim-0
  // vector vs no input)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def inputTypes = Seq(ArrayType(LongType))

  private def add(buf: Array[Long], v: ArrayData): Array[Long] = {
    // explicit element loop, not toLongArray(): the bulk copy reads
    // null slots as 0, silently corrupting sums — null ELEMENTS must
    // fail as loudly as ragged/zero-length vectors do
    val n = v.numElements()
    require(n > 0, "vec_sum_l: zero-length vector")
    val out = if (buf.isEmpty) new Array[Long](n) else buf
    require(out.length == n,
      s"vec_sum_l: vector length mismatch (${out.length} vs $n)")
    var i = 0
    while (i < n) {
      require(!v.isNullAt(i), s"vec_sum_l: null vector element at $i")
      out(i) += v.getLong(i)
      i += 1
    }
    out
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else {
      require(buf.length == other.length,
        s"vec_sum_l: vector length mismatch (${buf.length} vs ${other.length})")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(n: Int): VecSumLong =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecSumLong =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): VecSumLong = copy(child = c(0))
  override def prettyName: String = "vec_sum_l"
}

object VecSumLong {
  /** DataFrame-API form: `vecSum(col("qv"))`. */
  def vecSum(v: Column): Column =
    ColumnBridge.column(
      VecSumLong(ColumnBridge.expression(v)).toAggregateExpression())
}
