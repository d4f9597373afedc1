package graft

import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Coordinate

import graft.functions.st._
import graft.geom.{GeoArrow, Wkb}

/** GeoArrow-style native nested encodings (struct / list<struct> /
 *  list<list<struct>>) — reference geoseries.py:82-140. */
class GeoArrowSpec extends SparkSpec {

  test("kernel: polygon with hole round-trips rings exactly") {
    val shell = Array((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))
    val hole = Array((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))
    val poly = Wkb.factory.createPolygon(
      Wkb.factory.createLinearRing(shell.map { case (x, y) => new Coordinate(x, y) }),
      Array(Wkb.factory.createLinearRing(hole.map { case (x, y) => new Coordinate(x, y) })))
    val nat = GeoArrow.polygonNative(Wkb.write(poly))
    assert(nat.numElements() == 2)
    assert(nat.getArray(0).numElements() == 5 && nat.getArray(1).numElements() == 5)
    val back = Wkb.read(GeoArrow.polygonFromNative(nat))
    assert(back.equalsExact(poly))
    assert(back.getArea == 100.0 - 4.0)
  }

  test("kernel: unclosed native ring is closed automatically") {
    val open = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)).map { case (x, y) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](x, y)): Any
        })))
    val geom = Wkb.read(GeoArrow.polygonFromNative(open))
    assert(geom.getArea == 16.0)
  }

  test("kernel: type mismatches yield NULL (mirrors st_x semantics)") {
    val pt = Wkb.write(Wkb.factory.createPoint(new Coordinate(1, 2)))
    assert(GeoArrow.lineNative(pt) == null)
    assert(GeoArrow.polygonNative(pt) == null)
    val row = GeoArrow.pointNative(pt)
    assert(row.getDouble(0) == 1.0 && row.getDouble(1) == 2.0)
    val line = Wkb.write(Wkb.factory.createLineString(
      Array(new Coordinate(0, 0), new Coordinate(1, 1))))
    assert(GeoArrow.pointNative(line) == null)
  }

  test("kernel: Multi* native encodings round-trip (reference read-path parity)") {
    val f = Wkb.factory
    // MultiPoint
    val mpt = Wkb.write(f.createMultiPoint(Array(
      f.createPoint(new Coordinate(1, 2)), f.createPoint(new Coordinate(3, 4)))))
    val mptNat = GeoArrow.multiPointNative(mpt)
    assert(mptNat.numElements() == 2)
    assert(mptNat.getStruct(1, 2).getDouble(0) == 3.0)
    assert(java.util.Arrays.equals(GeoArrow.multiPointFromNative(mptNat), mpt))
    // MultiLineString
    val ml = Wkb.write(f.createMultiLineString(Array(
      f.createLineString(Array(new Coordinate(0, 0), new Coordinate(1, 1))),
      f.createLineString(Array(new Coordinate(5, 5), new Coordinate(6, 7), new Coordinate(8, 9))))))
    val mlNat = GeoArrow.multiLineNative(ml)
    assert(mlNat.numElements() == 2 && mlNat.getArray(1).numElements() == 3)
    assert(java.util.Arrays.equals(GeoArrow.multiLineFromNative(mlNat), ml))
    // MultiPolygon with a hole in the first part (triple-nested)
    val shell = f.createLinearRing(Array(
      new Coordinate(0, 0), new Coordinate(10, 0), new Coordinate(10, 10),
      new Coordinate(0, 10), new Coordinate(0, 0)))
    val hole = f.createLinearRing(Array(
      new Coordinate(2, 2), new Coordinate(4, 2), new Coordinate(4, 4),
      new Coordinate(2, 4), new Coordinate(2, 2)))
    val p2 = f.createPolygon(f.createLinearRing(Array(
      new Coordinate(20, 0), new Coordinate(22, 0), new Coordinate(22, 2),
      new Coordinate(20, 2), new Coordinate(20, 0))))
    val mp = Wkb.write(f.createMultiPolygon(Array(f.createPolygon(shell, Array(hole)), p2)))
    val mpNat = GeoArrow.multiPolygonNative(mp)
    assert(mpNat.numElements() == 2)
    assert(mpNat.getArray(0).numElements() == 2) // shell + hole
    val rt = GeoArrow.multiPolygonFromNative(mpNat)
    assert(java.util.Arrays.equals(rt, mp))
    assert(Wkb.read(rt).getArea == 100.0 - 4.0 + 4.0)
    // single-type inputs yield NULL on the Multi* readers and vice versa
    val pt = Wkb.write(f.createPoint(new Coordinate(1, 2)))
    assert(GeoArrow.multiPointNative(pt) == null)
    assert(GeoArrow.multiLineNative(pt) == null)
    assert(GeoArrow.multiPolygonNative(pt) == null)
    assert(GeoArrow.polygonNative(mp) == null)
  }

  test("DSL: native columns are plain nested Spark types, codegen-evaluated") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 5.0, 6.0)).toDF("x1", "y1", "x2", "y2")
      .withColumn("line", st_makeLine(col("x1"), col("y1"), col("x2"), col("y2")))
      .select(st_line_native(col("line")).as("nat"))
    assert(df.schema("nat").dataType.sql ==
      "ARRAY<STRUCT<x: DOUBLE NOT NULL, y: DOUBLE NOT NULL>>")
    val out = df.select(element_at(col("nat"), 2).getField("x")).as[Double].head()
    assert(out == 5.0)
    val rt = df.select(st_length(st_from_line_native(col("nat")))).as[Double].head()
    assert(rt == math.sqrt(32.0))
  }
}
