package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Bounded-heap top-k aggregate: keeps the k best (score desc, id asc) entries
 * per group. As a `TypedImperativeAggregate` it participates in partial
 * aggregation, so each map task reduces its slice of the corpus to a k-entry
 * heap before the shuffle — the exchange moves O(tasks × k) rows instead of
 * every scored row (the defect a window-function top-k has).
 *
 * Output: `array<struct<neighbor_id: long, sim: double>>`, best first.
 */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // Dequeue removes the WORST entry: lower sim first, then higher id.
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  private def add(
      buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (distinctIds) {
      // Candidate generators that can score the same (group, id) twice —
      // e.g. IVF multi-assignment, where a corpus vector lives in several
      // cells — must not occupy two heap slots with one neighbor. k is
      // small, so a linear membership scan beats a side index.
      val existing = buf.find(_._2 == e._2)
      if (existing.isDefined) {
        if (existing.get._1 >= e._1) return
        val kept = buf.dequeueAll.filterNot(_._2 == e._2)
        buf.clear()
        kept.foreach(buf.enqueue(_))
      }
    }
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.dequeueAll.reverse // worst-first dequeue → best first
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

object TopKFunctions {
  /** Top-k (score desc, id asc) entries per group, as array<struct<neighbor_id, sim>>. */
  def topk_by_score(score: Column, id: Column, k: Int, distinctIds: Boolean = false): Column =
    Bridge.column(TopKByScore(
      Bridge.expression(score.cast("double")),
      Bridge.expression(id.cast("long")), k, distinctIds).toAggregateExpression())
}
