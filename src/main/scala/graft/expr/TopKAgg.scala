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
 * Bounded top-k as a Catalyst aggregate: keeps the k best (score, payload)
 * pairs per group in a size-k binary heap, ordered by (score, payload) —
 * ascending scores when `asc`, else descending; payload ascending breaks ties.
 *
 * This is the scale-safe kNN plan: `row_number().over(Window.partitionBy(q))`
 * funnels every candidate row through one reducer task per query id, a
 * single-task sort of the whole corpus at 10^12 rows. A bounded aggregate
 * instead combines map-side (each input partition contributes at most k rows
 * per group to the shuffle) and merges k-element heaps at the reducer —
 * shuffle volume O(partitions * k), independent of corpus size.
 *
 * eval returns the k pairs best-first as array<struct<score double, payload
 * bigint>> (posexplode gives the 0-based rank).
 */
case class TopKAgg(score: Expression, payload: Expression, k: Int, asc: Boolean,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {
  require(k > 0, s"topk_by k must be positive, got $k")

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k, asc)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      val sv = s.asInstanceOf[Double]
      if (!sv.isNaN) buf.offer(sv, p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKAgg.Buf, other: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < other.size) { buf.offer(other.scores(i), other.payloads(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val sorted = buf.sortedBestFirst()
    new GenericArrayData(sorted.map { case (s, p) =>
      new GenericInternalRow(Array[Any](s, p)): Any
    })
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      o.writeDouble(buf.scores(i)); o.writeLong(buf.payloads(i)); i += 1
    }
    o.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKAgg.Buf(k, asc)
    var i = 0
    while (i < n) { buf.offer(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("payload", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, payload)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), payload = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk_by"
}

object TopKAgg {

  /** Size-k heap with the WORST kept element at the root, so a better
   *  candidate evicts it in O(log k). Ordering: (score, payload), score
   *  ascending when `asc` else descending, payload ascending on ties. */
  final class Buf(k: Int, asc: Boolean) {
    val scores = new Array[Double](k)
    val payloads = new Array[Long](k)
    var size = 0

    /** true when (s1,p1) is WORSE than (s2,p2) under the result ordering. */
    @inline private def worse(s1: Double, p1: Long, s2: Double, p2: Long): Boolean =
      if (s1 != s2) { if (asc) s1 > s2 else s1 < s2 } else p1 > p2

    def offer(s: Double, p: Long): Unit = {
      if (size < k) {
        var i = size
        scores(i) = s; payloads(i) = p; size += 1
        // sift up toward the worst-at-root
        while (i > 0 && worse(scores(i), payloads(i), scores((i - 1) / 2), payloads((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (worse(scores(0), payloads(0), s, p)) {
        scores(0) = s; payloads(0) = p
        // sift down
        var i = 0
        var cont = true
        while (cont) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var w = i
          if (l < size && worse(scores(l), payloads(l), scores(w), payloads(w))) w = l
          if (r < size && worse(scores(r), payloads(r), scores(w), payloads(w))) w = r
          if (w == i) cont = false else { swap(i, w); i = w }
        }
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val tp = payloads(a); payloads(a) = payloads(b); payloads(b) = tp
    }

    def sortedBestFirst(): Array[(Double, Long)] = {
      val arr = Array.tabulate(size)(i => (scores(i), payloads(i)))
      arr.sortWith { case ((s1, p1), (s2, p2)) =>
        if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 } else p1 < p2
      }
    }
  }

  /** Column DSL: the k best (score, payload) rows per group, best-first. */
  def topk_by(score: Column, payload: Column, k: Int, asc: Boolean): Column =
    Bridge.column(TopKAgg(
      Bridge.expression(score.cast("double")),
      Bridge.expression(payload.cast("long")), k, asc).toAggregateExpression())
}
