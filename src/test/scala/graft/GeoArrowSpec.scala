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
