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
import org.apache.spark.unsafe.types.UTF8String

/** [[TopKByLong]]'s string-labelled sibling: bounded-heap per-group
  * top-k of (score: long, id: string) pairs, score descending with
  * ascending-binary-id tie-break, evaluating to
  * `array<struct<score:bigint, id:string>>` sorted best-first.
  *
  * Exists so ranked-label queries (top terms per source, top
  * categories per segment) get the same partial-aggregating bounded
  * exchange as the numeric kNN path — the alternative `row_number()
  * OVER (PARTITION BY group ORDER BY score)` sorts each group's whole
  * label universe on a single reducer, the exact shape the round-4
  * verdict flagged for `llm_distinctive_terms` at 100 TB.
  *
  * Determinism: (score desc, id binary-asc) is a total order over
  * distinct pairs, and equal pairs are interchangeable, so the
  * retained multiset never depends on insertion/merge order — required
  * for the DuckDB-oracle hash compare. UTF8String's compareTo is an
  * unsigned byte-wise compare, which coincides with DuckDB's default
  * BINARY collation.
  */
case class TopKByLongStr(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, UTF8String)]]
  with ExpectsInputTypes {

  require(k > 0, "top-k requires k > 0")

  override def inputTypes = Seq(LongType, StringType)

  private def worstFirst = TopKByLongStr.WorstFirst

  override def createAggregationBuffer()
      : mutable.PriorityQueue[(Long, UTF8String)] =
    new mutable.PriorityQueue[(Long, UTF8String)]()(worstFirst)

  /** `owned`: whether `pair._2` is already safe to retain. Strings
    * eval'd off an UnsafeRow point into a reused scan buffer, so a
    * retained NEW entry must be cloned — but only when it actually
    * displaces something (clone-on-insert, not clone-per-row). */
  private def insert(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      pair: (Long, UTF8String),
      owned: Boolean): Unit = {
    def owning = if (owned) pair else (pair._1, pair._2.clone())
    if (buf.size < k) buf.enqueue(owning)
    else if (worstFirst.compare(pair, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(owning)
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Long, UTF8String)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, (s.asInstanceOf[Long], i.asInstanceOf[UTF8String]),
        owned = false)
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, UTF8String)],
      other: mutable.PriorityQueue[(Long, UTF8String)])
      : mutable.PriorityQueue[(Long, UTF8String)] = {
    other.foreach(insert(buf, _, owned = true))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, UTF8String)]): Any =
    new GenericArrayData(buf.toSeq.sorted(worstFirst)
      .map { case (s, i) => InternalRow(s, i) })

  override def serialize(
      buf: mutable.PriorityQueue[(Long, UTF8String)]): Array[Byte] = {
    val entries = buf.toSeq.map { case (s, i) => (s, i.getBytes) }
    val bb = ByteBuffer.allocate(
      4 + entries.map(e => 12 + e._2.length).sum)
    bb.putInt(entries.size)
    entries.foreach { case (s, b) =>
      bb.putLong(s); bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Long, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val s = bb.getLong
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      insert(buf, (s, UTF8String.fromBytes(b)), owned = true)
      j += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)

  override def withNewMutableAggBufferOffset(n: Int): TopKByLongStr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByLongStr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByLongStr =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "top_k_ls"
}

object TopKByLongStr {
  /** Queue head = eviction candidate: smallest score, then largest id
    * in binary order. Shared instance — no per-comparison garbage. */
  private[functions] val WorstFirst: Ordering[(Long, UTF8String)] =
    new Ordering[(Long, UTF8String)] {
      override def compare(
          a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  /** DataFrame-API form: `topKStr(col("lift"), col("term"), 3)`. */
  def topKStr(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByLongStr(
      ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())
}
