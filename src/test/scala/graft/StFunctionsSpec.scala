package graft

import org.apache.spark.sql.functions._
import graft.functions.st._
import graft.geom.{GeomKernel, Wkb}

/** DataFrame-level smoke of the StaticInvoke-backed ST DSL (codegen path). */
class StFunctionsSpec extends SparkSpec {

  test("st_point / st_x / st_y round-trip through codegen") {
    val df = spark.range(5).select(
      col("id"),
      st_x(st_point(col("id") * 2.0, col("id") * 3.0)).as("x"),
      st_y(st_point(col("id") * 2.0, col("id") * 3.0)).as("y"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(0.0, 2.0, 4.0, 6.0, 8.0))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(0.0, 3.0, 6.0, 9.0, 12.0))
  }

  test("st_x is NULL for non-point geometry") {
    val df = spark.range(1).select(
      st_x(st_makeBox(lit(0.0), lit(0.0), lit(1.0), lit(1.0))).as("x"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("area / centroid / bounds / length of a box") {
    val df = spark.range(1).select(
      st_area(st_makeBox(lit(0.0), lit(0.0), lit(4.0), lit(2.0))).as("area"),
      st_x(st_centroid(st_makeBox(lit(0.0), lit(0.0), lit(4.0), lit(2.0)))).as("cx"),
      st_bounds(st_makeBox(lit(0.0), lit(0.0), lit(4.0), lit(2.0))).as("b"),
      st_length(st_makeBox(lit(0.0), lit(0.0), lit(4.0), lit(2.0))).as("len"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 8.0)
    assert(r.getDouble(1) == 2.0)
    val b = r.getStruct(2)
    assert((b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3)) == ((0.0, 0.0, 4.0, 2.0)))
    assert(r.getDouble(3) == 12.0) // exterior ring perimeter
  }

  test("contains excludes boundary (georust semantics)") {
    val df = spark.createDataFrame(Seq(
      (1, 1.0, 1.0), (2, 0.0, 10.0), (3, 25.0, 25.0))).toDF("id", "x", "y")
      .select(col("id"),
        st_contains(st_makeBox(lit(0.0), lit(0.0), lit(20.0), lit(20.0)),
          st_point(col("x"), col("y"))).as("c"))
    val m = df.collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(m == Map(1 -> true, 2 -> false, 3 -> false))
  }

  test("null geometry propagates to null result") {
    val df = spark.sql("select cast(null as binary) as g")
      .select(st_area(col("g")).as("a"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("st_dump + explode mirrors the reference explode bench shape") {
    // benches/explode.rs: MultiPoints of 2 points -> 2x rows of Points
    val mp = Wkb.write(Wkb.factory.createMultiPointFromCoords(Array(
      new org.locationtech.jts.geom.Coordinate(1, 2),
      new org.locationtech.jts.geom.Coordinate(3, 4))))
    val df = spark.createDataFrame(Seq((1, mp))).toDF("id", "geom")
      .select(col("id"), explode(st_dump(col("geom"))).as("part"))
      .select(col("id"), st_x(col("part")).as("x"), st_geomType(col("part")).as("t"))
    val rows = df.collect().sortBy(_.getDouble(1))
    assert(rows.length == 2)
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.0, 3.0))
    assert(rows.forall(_.getInt(2) == GeomKernel.POINT))
  }

  test("affine family: translate / rotate180 / scale / skew matrix contract") {
    val df = spark.range(1).select(
      st_x(st_translate(st_point(lit(1.0), lit(2.0)), lit(10.0), lit(10.0))).as("tx"),
      st_x(st_rotate(st_point(lit(3.0), lit(0.0)), lit(180.0), lit(2), lit(0.0), lit(0.0))).as("rx"),
      st_x(st_scale(st_point(lit(2.0), lit(1.0)), lit(3.0), lit(1.0), lit(2), lit(0.0), lit(0.0))).as("sx"),
      // skew contract (geoseries.rs:129-138): x' = x + tan(xs)*y + (-origin.y*tan(xs))
      st_x(st_skew(st_point(lit(1.0), lit(2.0)), lit(45.0), lit(0.0), lit(2), lit(0.0), lit(0.0))).as("kx"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - (-3.0)) < 1e-12)
    assert(r.getDouble(2) == 6.0)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-12) // 1 + tan(45°)*2 = 3
  }

  test("geodesic length: quarter meridian ~ 10,001.966 km (vincenty)") {
    val df = spark.range(1).select(
      st_geodesicLength(st_makeLine(lit(0.0), lit(0.0), lit(0.0), lit(90.0)), "vincenty").as("d"),
      st_geodesicLength(st_makeLine(lit(0.0), lit(0.0), lit(0.0), lit(90.0)), "haversine").as("h"))
    val r = df.collect()(0)
    assert(math.abs(r.getDouble(0) - 1.00019657e7) < 1e3)
    assert(math.abs(r.getDouble(1) - math.Pi / 2 * 6371008.8) < 1.0)
  }

  test("st_transform 4326<->3857 round trip") {
    val df = spark.range(1).select(
      st_x(st_transform(st_transform(st_point(lit(10.0), lit(45.0)), lit(4326), lit(3857)),
        lit(3857), lit(4326))).as("x"))
    assert(math.abs(df.collect()(0).getDouble(0) - 10.0) < 1e-9)
  }
}
