package graft

import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Coordinate

import graft.functions.st._
import graft.geom.{GeomKernel, Wkb}
import graft.sources.Shapefile

/**
 * ESRI Shapefile source/sink (reference read_file's canonical OGR format;
 * py-geopolars io/file.py:83-87 names Shapefile's 0-based FIDs explicitly).
 */
class ShapefileSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("point round-trip: geometry, attributes of every dbf type, fids") {
    val dir = tmp("shp-points")
    val src = spark.range(200).select(
      col("id"),
      concat(lit("name-"), col("id")).as("name"),
      (col("id") * 0.5 - 10.0).as("score"),
      (col("id") % 3 === 0).as("flag"),
      date_add(lit(java.sql.Date.valueOf("2020-01-01")), col("id").cast("int")).as("day"),
      st_point(col("id") * 1.5 - 100.0, col("id") * -0.25 + 30.0).as("geometry"))
    Shapefile.write(src, dir)
    val back = Shapefile.read(spark, dir)
    assert(back.columns.toSeq ==
      Seq("fid", "id", "name", "score", "flag", "day", "geometry"))
    assert(back.count() == 200)
    // fids are 0-based and globally sequential
    assert(back.agg(min("fid"), max("fid")).head() ==
      org.apache.spark.sql.Row(0L, 199L))
    val bad = back.filter(
      col("name") =!= concat(lit("name-"), col("id")) ||
      col("score") =!= (col("id") * 0.5 - 10.0) ||
      col("flag") =!= (col("id") % 3 === 0) ||
      col("day") =!= date_add(lit(java.sql.Date.valueOf("2020-01-01")), col("id").cast("int")) ||
      st_x(col("geometry")) =!= (col("id") * 1.5 - 100.0) ||
      st_y(col("geometry")) =!= (col("id") * -0.25 + 30.0))
    assert(bad.count() == 0)
  }

  test("doubles survive the dbf decimal text bit-exactly (17 sig digits)") {
    val dir = tmp("shp-dbl")
    val vals = Seq(0.1, -3.25, 1.0 / 3.0, math.Pi, 1.23456789012345e8, -7.5e-3)
    val src = spark.createDataFrame(vals.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("id", "v")
      .withColumn("geometry", st_point(col("v"), lit(0.0)))
    Shapefile.write(src, dir)
    val got = Shapefile.read(spark, dir).select("id", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == v, s"value $i: ${got(i.toLong)} != $v")
    }
  }

  test("polygon with hole: CW/CCW ring orientation round-trips exactly") {
    val f = Wkb.factory
    val shell = f.createLinearRing(Array(
      new Coordinate(0, 0), new Coordinate(10, 0), new Coordinate(10, 10),
      new Coordinate(0, 10), new Coordinate(0, 0)))
    val hole = f.createLinearRing(Array(
      new Coordinate(2, 2), new Coordinate(4, 2), new Coordinate(4, 4),
      new Coordinate(2, 4), new Coordinate(2, 2)))
    val poly = f.createPolygon(shell, Array(hole))
    val dir = tmp("shp-hole")
    val src = spark.createDataFrame(Seq((1L, Wkb.write(poly)))).toDF("id", "geometry")
    Shapefile.write(src, dir)
    val back = Wkb.read(Shapefile.read(spark, dir)
      .select("geometry").head().getAs[Array[Byte]](0))
    assert(back.getGeometryType == "Polygon")
    assert(back.norm().equalsExact(poly.norm()))
    assert(GeomKernel.stArea(Wkb.write(back)) == 96.0)
  }

  test("multipolygon: holes attach to their containing shell") {
    val f = Wkb.factory
    def box(x: Double, y: Double, s: Double) = f.createPolygon(f.createLinearRing(Array(
      new Coordinate(x, y), new Coordinate(x + s, y), new Coordinate(x + s, y + s),
      new Coordinate(x, y + s), new Coordinate(x, y))))
    val withHole = f.createPolygon(
      box(0, 0, 10).getExteriorRing.asInstanceOf[org.locationtech.jts.geom.LinearRing],
      Array(f.createLinearRing(Array(
        new Coordinate(1, 1), new Coordinate(3, 1), new Coordinate(3, 3),
        new Coordinate(1, 3), new Coordinate(1, 1)))))
    val mp = f.createMultiPolygon(Array(withHole, box(100, 100, 5)))
    val dir = tmp("shp-mp")
    Shapefile.write(
      spark.createDataFrame(Seq((1L, Wkb.write(mp)))).toDF("id", "geometry"), dir)
    val back = Wkb.read(Shapefile.read(spark, dir)
      .select("geometry").head().getAs[Array[Byte]](0))
    assert(back.getGeometryType == "MultiPolygon")
    assert(back.norm().equalsExact(mp.norm()))
    assert(back.getArea == (100.0 - 4.0) + 25.0)
  }

  test("polylines: single part -> LineString, multi part -> MultiLineString") {
    val f = Wkb.factory
    val single = f.createLineString(Array(new Coordinate(0, 0), new Coordinate(3, 4)))
    val multi = f.createMultiLineString(Array(
      f.createLineString(Array(new Coordinate(0, 0), new Coordinate(1, 0))),
      f.createLineString(Array(new Coordinate(5, 5), new Coordinate(6, 7)))))
    val dir1 = tmp("shp-line1"); val dir2 = tmp("shp-line2")
    Shapefile.write(
      spark.createDataFrame(Seq((1L, Wkb.write(single)))).toDF("id", "geometry"), dir1)
    Shapefile.write(
      spark.createDataFrame(Seq((1L, Wkb.write(multi)))).toDF("id", "geometry"), dir2)
    val b1 = Wkb.read(Shapefile.read(spark, dir1).select("geometry").head().getAs[Array[Byte]](0))
    val b2 = Wkb.read(Shapefile.read(spark, dir2).select("geometry").head().getAs[Array[Byte]](0))
    assert(b1.equalsExact(single))
    assert(b2.equalsExact(multi))
  }

  test("multipoint and null geometries round-trip") {
    val f = Wkb.factory
    val mp = f.createMultiPointFromCoords(Array(
      new Coordinate(1, 2), new Coordinate(3, 4), new Coordinate(5, 6)))
    val dir = tmp("shp-mpn")
    val src = spark.createDataFrame(Seq(
      (1L, Wkb.write(mp)), (2L, null.asInstanceOf[Array[Byte]]))).toDF("id", "geometry")
    Shapefile.write(src.repartition(1), dir)
    val rows = Shapefile.read(spark, dir).orderBy("fid").collect()
    assert(rows.length == 2)
    assert(Wkb.read(rows(0).getAs[Array[Byte]]("geometry")).equalsExact(mp))
    assert(rows(1).getAs[Array[Byte]]("geometry") == null)
  }

  test("readFile(format=shapefile|geojsonseq): routing + bbox/fids/where compose") {
    val dirShp = tmp("rf-shp"); val dirGj = tmp("rf-gj")
    val src = spark.range(100).select(col("id"),
      st_point(col("id") * 1.0, col("id") * 2.0).as("geometry"))
    Shapefile.write(src, dirShp)
    graft.sources.CellStore.writeGeoJsonSeq(src, dirGj)
    // shapefile: native fid column composes with the fids param
    val viaFids = graft.sources.CellStore.readFile(spark, dirShp,
      format = "shapefile", fids = Some(Seq(3L, 7L)), returnFids = true)
    assert(viaFids.select("fid").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 7L))
    // bbox on a non-parquet source is the exact bbox-intersects predicate:
    // points (id, 2id) with id in [10, 20] -> lat in [20, 40], lon in [10, 20]
    val viaBbox = graft.sources.CellStore.readFile(spark, dirShp,
      format = "shapefile", bbox = Some((20.0, 10.0, 40.0, 20.0)),
      where = Some("id % 2 = 0"))
    assert(viaBbox.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (10L to 20L by 2).toSeq)
    // geojsonseq route: columns prune, maxFeatures limits
    val gj = graft.sources.CellStore.readFile(spark, dirGj,
      format = "geojsonseq", columns = Seq("properties"), maxFeatures = Some(5L))
    assert(gj.columns.toSeq == Seq("properties") && gj.count() == 5)
    intercept[IllegalArgumentException](
      graft.sources.CellStore.readFile(spark, dirShp, format = "gpkg"))
    // layer selects one shapefile basename from a directory datasource
    val oneLayer = graft.sources.CellStore.readFile(spark, dirShp,
      format = "shapefile", layer = Some("part-00000"))
    assert(oneLayer.count() > 0 && oneLayer.count() < 100)
    intercept[IllegalArgumentException](
      graft.sources.CellStore.readFile(spark, dirShp,
        format = "shapefile", layer = Some("nope")))
    intercept[IllegalArgumentException](
      graft.sources.CellStore.readFile(spark, dirGj,
        format = "geojsonseq", layer = Some("x")))
    // skip_features pushes into .shx range slicing; fids stay the REAL
    // file positions (OGR semantics) and maxFeatures clips the window
    val skipped = graft.sources.CellStore.readFile(spark, dirShp,
      format = "shapefile", skipFeatures = 95L, maxFeatures = Some(3L))
    assert(skipped.select("fid").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(95L, 96L, 97L))
    val skipPastEnd = graft.sources.Shapefile.read(spark, dirShp, skipFeatures = 1000L)
    assert(skipPastEnd.count() == 0)
    intercept[IllegalArgumentException](
      graft.sources.CellStore.readFile(spark, dirShp, format = "shapefile",
        skipFeatures = 5L, where = Some("id > 3")))
    intercept[IllegalArgumentException](
      graft.sources.CellStore.readFile(spark, dirShp, skipFeatures = 5L))
  }

  test("mixed shape classes in one partition fail loudly (no corrupt file)") {
    val f = Wkb.factory
    val dir = tmp("shp-mixed")
    val src = spark.createDataFrame(Seq(
      (1L, Wkb.write(f.createPoint(new Coordinate(1, 2)))),
      (2L, Wkb.write(f.createLineString(Array(
        new Coordinate(0, 0), new Coordinate(1, 1)))))))
      .toDF("id", "geometry").repartition(1)
    val e = intercept[org.apache.spark.SparkException](Shapefile.write(src, dir))
    assert(e.getMessage.contains("mixed shape classes") ||
      e.getCause != null)
  }

  test("record-range fan-out: small maxRecordsPerTask reads the same rows") {
    val dir = tmp("shp-ranges")
    val src = spark.range(500).select(col("id"),
      st_point(col("id") * 1.0, col("id") * 2.0).as("geometry"))
    Shapefile.write(src.repartition(3), dir)
    val whole = Shapefile.read(spark, dir)
    val sliced = Shapefile.read(spark, dir, maxRecordsPerTask = 37)
    assert(whole.count() == 500 && sliced.count() == 500)
    // same (id -> x) content regardless of slicing; fids distinct 0..499
    assert(sliced.select(countDistinct("fid")).head().getLong(0) == 500)
    val a = whole.select(col("id"), st_x(col("geometry"))).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = sliced.select(col("id"), st_x(col("geometry"))).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    assert(a.forall { case (id, x) => x == id.toDouble })
  }
}
