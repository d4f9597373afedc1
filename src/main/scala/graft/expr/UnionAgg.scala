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
 * TypedImperativeAggregate buffering geometries per group and merging with
 * JTS UnaryUnionOp (cascaded union) — partial aggregation happens map-side,
 * so each shuffle record is one partially-unioned geometry set per group.
 *
 * Scale note: intended for admin/tile-layer-sized groups (the reference's
 * use is dissolving a GeoSeries); buffers are compacted with a cascaded
 * union whenever they exceed `CompactAt` rows so memory stays bounded.
 */
case class UnionAgg(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Geometry]] {

  private val CompactAt = 256

  override def createAggregationBuffer(): ArrayBuffer[Geometry] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Geometry],
                      input: org.apache.spark.sql.catalyst.InternalRow): ArrayBuffer[Geometry] = {
    val v = child.eval(input)
    if (v != null) {
      buf += Wkb.read(v.asInstanceOf[Array[Byte]])
      compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Geometry],
                     other: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    buf ++= other
    compact(buf)
    buf
  }

  private def compact(buf: ArrayBuffer[Geometry]): Unit =
    if (buf.length >= CompactAt) {
      val merged = UnaryUnionOp.union(buf.asJava)
      buf.clear()
      buf += merged
    }

  override def eval(buf: ArrayBuffer[Geometry]): Any =
    if (buf.isEmpty) null
    else Wkb.write(UnaryUnionOp.union(buf.asJava))

  override def serialize(buf: ArrayBuffer[Geometry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.length)
    buf.foreach { geom =>
      val wkb = Wkb.write(geom)
      o.writeInt(wkb.length); o.write(wkb)
    }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[Geometry]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val wkb = new Array[Byte](len)
      in.readFully(wkb)
      buf += Wkb.read(wkb)
    }
    buf
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
  /** Column DSL: st_union_agg(geom) — dissolve a geometry column per group. */
  def st_union_agg(geom: Column): Column =
    Bridge.column(UnionAgg(Bridge.expression(geom)).toAggregateExpression())
}
