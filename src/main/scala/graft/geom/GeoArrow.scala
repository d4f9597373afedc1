package graft.geom

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.locationtech.jts.geom.{Coordinate, LineString, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon}

/**
 * GeoArrow-style NATIVE nested encodings alongside the WKB contract surface
 * (reference: py-geopolars/python/geopolars/internals/geoseries.py:82-140 —
 * Point = Struct{x,y}, LineString = List<Struct{x,y}>, Polygon =
 * List<List<Struct{x,y}>>; the reference's write path raises
 * NotImplementedError for Multi* types, which instead compose here as
 * `st_dump` + the single-type encoders).
 *
 * In Spark these map to StructType / ArrayType columns — Tungsten stores
 * them columnar and codegen reads fields without decoding WKB, so repeated
 * coordinate access (e.g. vertex analytics) skips the per-op WKB parse the
 * reference's README calls out as its main cost (README.md:82-85).
 */
object GeoArrow {

  private def xy(x: Double, y: Double): GenericInternalRow =
    new GenericInternalRow(Array[Any](x, y))

  private def ringData(cs: Array[Coordinate]): GenericArrayData =
    new GenericArrayData(cs.map(c => xy(c.x, c.y): Any))

  /** WKB Point -> struct{x,y}; NULL for any other type (mirrors st_x/st_y). */
  def pointNative(wkb: Array[Byte]): GenericInternalRow = Wkb.read(wkb) match {
    case p: Point if !p.isEmpty => xy(p.getX, p.getY)
    case _ => null
  }

  /** WKB LineString -> array<struct{x,y}>; NULL for any other type. */
  def lineNative(wkb: Array[Byte]): GenericArrayData = Wkb.read(wkb) match {
    case l: LineString => ringData(l.getCoordinates)
    case _ => null
  }

  /** WKB Polygon -> array<array<struct{x,y}>> (ring 0 = shell, then holes);
   *  NULL for any other type. Rings keep their closing vertex. */
  def polygonNative(wkb: Array[Byte]): GenericArrayData = Wkb.read(wkb) match {
    case p: Polygon =>
      val rings = new Array[Any](1 + p.getNumInteriorRing)
      rings(0) = ringData(p.getExteriorRing.getCoordinates)
      var i = 0
      while (i < p.getNumInteriorRing) {
        rings(i + 1) = ringData(p.getInteriorRingN(i).getCoordinates)
        i += 1
      }
      new GenericArrayData(rings)
    case _ => null
  }

  private def polygonData(p: Polygon): GenericArrayData = {
    val rings = new Array[Any](1 + p.getNumInteriorRing)
    rings(0) = ringData(p.getExteriorRing.getCoordinates)
    var i = 0
    while (i < p.getNumInteriorRing) {
      rings(i + 1) = ringData(p.getInteriorRingN(i).getCoordinates)
      i += 1
    }
    new GenericArrayData(rings)
  }

  /** WKB MultiPoint -> array<struct{x,y}> (reference read path reconstructs
   *  all six native encodings, geoseries.py:170-214; its WRITE path raises on
   *  Multi*, so these three are read-parity extensions). NULL otherwise. */
  def multiPointNative(wkb: Array[Byte]): GenericArrayData = Wkb.read(wkb) match {
    case mp: MultiPoint => ringData(mp.getCoordinates)
    case _ => null
  }

  /** WKB MultiLineString -> array<array<struct{x,y}>>; NULL otherwise. */
  def multiLineNative(wkb: Array[Byte]): GenericArrayData = Wkb.read(wkb) match {
    case ml: MultiLineString =>
      new GenericArrayData(Array.tabulate[Any](ml.getNumGeometries)(i =>
        ringData(ml.getGeometryN(i).getCoordinates)))
    case _ => null
  }

  /** WKB MultiPolygon -> array<array<array<struct{x,y}>>> (triple-nested,
   *  the deepest reference encoding, geoseries.py:193-214); NULL otherwise. */
  def multiPolygonNative(wkb: Array[Byte]): GenericArrayData = Wkb.read(wkb) match {
    case mp: MultiPolygon =>
      new GenericArrayData(Array.tabulate[Any](mp.getNumGeometries)(i =>
        polygonData(mp.getGeometryN(i).asInstanceOf[Polygon])))
    case _ => null
  }

  /** struct{x,y} -> WKB Point. */
  def pointFromNative(row: InternalRow): Array[Byte] =
    Wkb.write(Wkb.factory.createPoint(new Coordinate(row.getDouble(0), row.getDouble(1))))

  private def coords(arr: ArrayData): Array[Coordinate] =
    Array.tabulate(arr.numElements()) { i =>
      val r = arr.getStruct(i, 2)
      new Coordinate(r.getDouble(0), r.getDouble(1))
    }

  /** array<struct{x,y}> -> WKB LineString. */
  def lineFromNative(arr: ArrayData): Array[Byte] =
    Wkb.write(Wkb.factory.createLineString(coords(arr)))

  private def closedRing(cs: Array[Coordinate]): Array[Coordinate] =
    if (cs.length >= 3 && cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()

  /** array<array<struct{x,y}>> -> WKB Polygon (ring 0 shell, rest holes);
   *  unclosed rings are closed automatically. */
  def polygonFromNative(arr: ArrayData): Array[Byte] = {
    val shell = Wkb.factory.createLinearRing(
      closedRing(coords(arr.getArray(0))))
    val holes = Array.tabulate(arr.numElements() - 1) { i =>
      Wkb.factory.createLinearRing(closedRing(coords(arr.getArray(i + 1))))
    }
    Wkb.write(Wkb.factory.createPolygon(shell, holes))
  }

  private def jtsPolygon(arr: ArrayData): Polygon = {
    val shell = Wkb.factory.createLinearRing(closedRing(coords(arr.getArray(0))))
    val holes = Array.tabulate(arr.numElements() - 1) { i =>
      Wkb.factory.createLinearRing(closedRing(coords(arr.getArray(i + 1))))
    }
    Wkb.factory.createPolygon(shell, holes)
  }

  /** array<struct{x,y}> -> WKB MultiPoint. */
  def multiPointFromNative(arr: ArrayData): Array[Byte] =
    Wkb.write(Wkb.factory.createMultiPoint(
      coords(arr).map(Wkb.factory.createPoint)))

  /** array<array<struct{x,y}>> -> WKB MultiLineString. */
  def multiLineFromNative(arr: ArrayData): Array[Byte] =
    Wkb.write(Wkb.factory.createMultiLineString(
      Array.tabulate(arr.numElements())(i =>
        Wkb.factory.createLineString(coords(arr.getArray(i))))))

  /** array<array<array<struct{x,y}>>> -> WKB MultiPolygon. */
  def multiPolygonFromNative(arr: ArrayData): Array[Byte] =
    Wkb.write(Wkb.factory.createMultiPolygon(
      Array.tabulate(arr.numElements())(i => jtsPolygon(arr.getArray(i)))))
}
