package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable Misra–Gries frequent-items sketch over an `array<string>` token
 * column. Each group keeps at most `capacity` counters; the aggregate
 * consumes token ARRAYS directly (one update per document), so the corpus
 * never explodes to one row per token occurrence before the exchange — the
 * property that matters at 100 TB, where the full token table is billions
 * of distinct keys but the sketch moves O(tasks × capacity) rows.
 *
 * State per group: counts (≤ capacity entries), `total` (true token count,
 * exact) and `err` (the cumulative undercount bound). The classic MG
 * invariants survive both the decrement-round update and the summed merge
 * (Agarwal et al., "Mergeable Summaries", PODS 2012):
 *
 *   - for every tracked item:  0 ≤ true(x) − count(x) ≤ err
 *   - for every untracked item:            true(x) ≤ err
 *   - err ≤ total / (capacity + 1)
 *
 * so the candidate list is provably complete for any threshold > err —
 * which downstream code checks at runtime before trusting it (see
 * `graft.pipeline.HeavyHitters`). The estimate itself is deliberately NOT
 * the final answer: a second exact pass over candidates makes the operator
 * deterministic and oracle-exact while still never shuffling the long tail.
 */
final class FreqSketch(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var total: Long = 0L
  var err: Long = 0L

  def add(token: String): Unit = {
    total += 1
    counts.get(token) match {
      case Some(c) => counts.update(token, c + 1)
      case None =>
        if (counts.size < capacity) counts.update(token, 1L)
        else {
          // Decrement round: every counter −1, the new item absorbed.
          // Removes capacity+1 total weight; ≤ total/(capacity+1) rounds.
          err += 1
          val dead = mutable.ArrayBuffer.empty[String]
          counts.foreachEntry { (k, c) =>
            if (c == 1L) dead += k else counts.update(k, c - 1)
          }
          dead.foreach(counts.remove)
        }
    }
  }

  /** Summed merge, then one δ-decrement if over capacity. */
  def mergeIn(other: FreqSketch): Unit = {
    total += other.total
    err += other.err
    other.counts.foreachEntry { (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      // δ = the (capacity+1)-th largest count; subtracting it from every
      // counter preserves the MG undercount invariant with err += δ.
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val delta = sorted(sorted.length - capacity - 1)
      err += delta
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreachEntry { (k, c) =>
        if (c <= delta) dead += k else counts.update(k, c - delta)
      }
      dead.foreach(counts.remove)
    }
  }
}

case class FrequentCandidates(
    tokens: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(capacity)

  override def update(buf: FreqSketch, input: InternalRow): FreqSketch = {
    val arr = tokens.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) buf.add(a.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  override def merge(a: FreqSketch, b: FreqSketch): FreqSketch = {
    a.mergeIn(b); a
  }

  override def eval(buf: FreqSketch): Any = {
    val cand = buf.counts.keysIterator.toArray
    java.util.Arrays.sort(cand, Ordering[String])
    InternalRow(
      new GenericArrayData(cand.map(UTF8String.fromString(_): Any)),
      buf.total,
      buf.err)
  }

  override def serialize(buf: FreqSketch): Array[Byte] = {
    val entries = buf.counts.toArray
    val payload = entries.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + 8 + 8 + entries.length * 12 + payload.map(_.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    bb.putLong(buf.total)
    bb.putLong(buf.err)
    var i = 0
    while (i < entries.length) {
      bb.putInt(payload(i).length)
      bb.put(payload(i))
      bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqSketch(capacity)
    buf.total = bb.getLong
    buf.err = bb.getLong
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.counts.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def children: Seq[Expression] = Seq(tokens)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("candidates", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentCandidates =
    copy(tokens = newChildren(0))
  override def prettyName: String = "frequent_candidates"
}

object FrequentItemsFunctions {
  /** Misra–Gries candidate sketch over an `array<string>` column: returns
   *  `struct(candidates array<string> /* sorted */, total long, err long)`.
   *  Every token with true frequency > `err` is guaranteed present. */
  def frequent_candidates(tokens: Column, capacity: Int): Column =
    Bridge.column(FrequentCandidates(Bridge.expression(tokens), capacity)
      .toAggregateExpression())
}
