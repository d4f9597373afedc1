package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/**
 * Mergeable heavy-hitters sketch (Misra-Gries 1982, merge rule from Agarwal
 * et al., "Mergeable Summaries", PODS 2012) as a Catalyst aggregate over Long
 * items with at most `k` counters.
 *
 * Guarantees: every reported count is an UNDER-estimate by at most n/(k+1)
 * (n = stream length), so any item with true frequency above n/(k+1) is
 * guaranteed present — and when a group has at most k distinct items the
 * sketch never decrements and the counts are EXACT (the regime the oracle
 * gate pins). Merge combines same-item counters then subtracts the (k+1)-th
 * largest count from everything, preserving the bound — the property that
 * makes map-side partials correct.
 *
 * This is the bounded census primitive for skew handling at 10^12 rows: an
 * exact hot-cell census shuffles one row per DISTINCT cell, while this
 * aggregate ships at most k counters per partition regardless of
 * cardinality, and every cell hot enough to need salting (count > n/(k+1))
 * is guaranteed to surface.
 *
 * eval returns array<struct<item bigint, count bigint>>, count descending,
 * item ascending on ties.
 */
case class FreqAgg(item: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqAgg.Buf] {
  require(k > 0, s"freq_items k must be positive, got $k")

  override def createAggregationBuffer(): FreqAgg.Buf = new FreqAgg.Buf(k)

  override def update(buf: FreqAgg.Buf, input: InternalRow): FreqAgg.Buf = {
    val v = item.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: FreqAgg.Buf, other: FreqAgg.Buf): FreqAgg.Buf = {
    other.counts.foreachEntry((item, cnt) => buf.offerNoShrink(item, cnt))
    buf.shrinkToK()
    buf
  }

  override def eval(buf: FreqAgg.Buf): Any = {
    val arr = buf.counts.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else i1 < i2
    }
    new GenericArrayData(arr.map { case (i, c) =>
      new GenericInternalRow(Array[Any](i, c)): Any
    })
  }

  override def serialize(buf: FreqAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.counts.size)
    buf.counts.foreachEntry { (i, c) => o.writeLong(i); o.writeLong(c) }
    o.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new FreqAgg.Buf(k)
    var i = 0
    while (i < n) { buf.offerNoShrink(in.readLong(), in.readLong()); i += 1 }
    buf.shrinkToK()
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", LongType, nullable = false),
      StructField("count", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(item = c(0))
  override def withNewMutableAggBufferOffset(o: Int): FreqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "freq_items"
}

object FreqAgg {

  final class Buf(k: Int) {
    val counts = new scala.collection.mutable.LongMap[Long]()

    /** Single-stream Misra-Gries step, weight `w` (w=1 for row updates).
     *  Counters are always positive, so 0 is a safe miss sentinel. */
    def offer(item: Long, w: Long): Unit = {
      val cur = counts.getOrElse(item, 0L)
      if (cur != 0L) counts(item) = cur + w
      else if (counts.size < k) counts(item) = w
      else {
        // no free counter: decrement everything by min(w, smallest count)
        var dec = w
        var minC = Long.MaxValue
        counts.foreachValue(c => if (c < minC) minC = c)
        if (minC < dec) dec = minC
        decrementAll(dec)
        val rem = w - dec
        if (rem > 0 && counts.size < k) counts(item) = rem
      }
    }

    /** Merge-side add without capacity enforcement (shrink afterwards). */
    def offerNoShrink(item: Long, w: Long): Unit =
      counts(item) = counts.getOrElse(item, 0L) + w

    /** Mergeable-summaries shrink: subtract the (k+1)-th largest count from
     *  every counter, drop the non-positive ones — at most k survive. */
    def shrinkToK(): Unit = {
      if (counts.size <= k) return
      val cs = counts.values.toArray
      java.util.Arrays.sort(cs)
      val sub = cs(cs.length - (k + 1)) // (k+1)-th largest
      decrementAll(sub)
    }

    private def decrementAll(d: Long): Unit = {
      if (d <= 0) return
      val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
      counts.foreachEntry { (i, c) =>
        if (c - d <= 0) dead += i else counts(i) = c - d
      }
      dead.foreach(counts.remove)
    }
  }

  /** Column DSL: heavy-hitters sketch of a Long item column with k counters.
   *  Exact when the group has at most k distinct items; otherwise every
   *  count under-estimates by at most n/(k+1). */
  def freq_items(item: Column, k: Int): Column =
    Bridge.column(FreqAgg(Bridge.expression(item.cast("long")), k)
      .toAggregateExpression())
}
