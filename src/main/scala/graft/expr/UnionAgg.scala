package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp

import graft.geom.Wkb
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/**
 * `unary_union` as a Catalyst aggregate (reference roadmap surface:
 * py-geopolars/docs/source/reference/geoseries.rst:110). A
 * TypedImperativeAggregate dissolving geometries per group with JTS
 * cascaded union; partial aggregation happens map-side, so shuffle records
 * carry partially-unioned chunks, not raw rows.
 *
 * Buffering is CHUNKED: raw geometries compact into one unioned chunk every
 * `ChunkSize` rows, and chunks are only combined once, at eval, by a single
 * cascaded union. (Re-unioning a growing accumulator per batch is quadratic
 * in group size — measured as a multi-minute hang at 150k rows/group.)
 */
case class UnionAgg(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UnionAgg.Buf] {
  import UnionAgg.{Buf, ChunkSize}

  override def createAggregationBuffer(): Buf = new Buf(ArrayBuffer.empty, ArrayBuffer.empty)

  override def update(buf: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.raw += Wkb.read(v.asInstanceOf[Array[Byte]])
      if (buf.raw.length >= ChunkSize) {
        buf.chunks += UnaryUnionOp.union(buf.raw.asJava)
        buf.raw.clear()
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf.chunks ++= other.chunks
    buf.raw ++= other.raw
    if (buf.raw.length >= ChunkSize) {
      buf.chunks += UnaryUnionOp.union(buf.raw.asJava)
      buf.raw.clear()
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val all = buf.chunks ++ buf.raw
    if (all.isEmpty) null
    else Wkb.write(UnaryUnionOp.union(all.asJava))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    val all = buf.chunks ++ buf.raw
    o.writeInt(all.length)
    all.foreach { geom =>
      val wkb = Wkb.write(geom)
      o.writeInt(wkb.length); o.write(wkb)
    }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val chunks = ArrayBuffer.empty[Geometry]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val wkb = new Array[Byte](len)
      in.readFully(wkb)
      chunks += Wkb.read(wkb)
    }
    new Buf(chunks, ArrayBuffer.empty)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): UnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UnionAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "st_union_agg"
}

object UnionAgg {
  final val ChunkSize = 256

  /** chunks = already-unioned geometries; raw = pending inputs. */
  final class Buf(val chunks: ArrayBuffer[Geometry], val raw: ArrayBuffer[Geometry])

  /** Column DSL: st_union_agg(geom) — dissolve a geometry column per group. */
  def st_union_agg(geom: Column): Column =
    Bridge.column(UnionAgg(Bridge.expression(geom)).toAggregateExpression())
}
