package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k aggregate: keeps the k best
  * (score, id) pairs, score descending with ascending-id tie-break,
  * and evaluates to `array<struct<score:bigint, id:bigint>>` sorted
  * best-first.
  *
  * Why an aggregate and not `row_number() OVER (PARTITION BY q)`:
  * a window moves EVERY scored row through one shuffle partition per
  * query group — with 3 query vectors and 100 TB of corpus, all
  * corpus rows land on 3 reducers. As a `TypedImperativeAggregate`
  * the heap participates in partial aggregation: each map task
  * reduces its partition to ≤ k pairs per group, so the exchange
  * carries O(partitions × k) rows instead of O(corpus). This is the
  * standard distributed-top-k shape (tree-reduce of bounded heaps) —
  * the same idea as Spark's own `TakeOrderedAndProject`, but usable
  * per group inside an aggregation.
  *
  * Determinism: insertion order never affects the result because the
  * (score desc, id asc) order is total — required for the exact
  * DuckDB-oracle hash compare.
  */
case class TopKByLong(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with ExpectsInputTypes {

  require(k > 0, "top-k requires k > 0")

  // declared input types: the analyzer inserts casts (or fails at
  // plan time) instead of update() throwing ClassCastException on
  // executors when a SQL user passes INT columns. (No explicit
  // Seq[AbstractDataType] annotation — that type is private[sql];
  // the inferred covariant type satisfies the override.)
  override def inputTypes = Seq(LongType, LongType)

  private def worstFirst = TopKByLong.WorstFirst

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    new mutable.PriorityQueue[(Long, Long)]()(worstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Long, Long)],
      pair: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(pair)
    else if (worstFirst.compare(pair, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(pair)
    }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, (s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)])
      : mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(buf.toSeq.sorted(worstFirst)
      .map { case (s, i) => InternalRow(s, i) })

  override def serialize(
      buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { insert(buf, (bb.getLong, bb.getLong)); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)

  override def withNewMutableAggBufferOffset(n: Int): TopKByLong =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByLong =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByLong =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "top_k_l"
}

object TopKByLong {
  /** "Greatest" element = WORST retained pair (smallest score, then
    * largest id), so the queue head is the eviction candidate. A
    * single shared instance — allocating one per comparison would put
    * a garbage object on every scored row of the hot path. */
  private[functions] val WorstFirst: Ordering[(Long, Long)] =
    new Ordering[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  /** DataFrame-API form: `topK(col("ip"), col("vec_id"), 10)`. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByLong(
      ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())
}
