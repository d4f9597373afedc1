package graft

import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Coordinate

import graft.functions.st._
import graft.geom.{GeoJson, GeomKernel, Wkb}
import graft.sources.CellStore

/**
 * GeoJSON codec + OGR-driver-parity sources (RFC 7946 / RFC 8142; reference
 * read_file's GeoJSON/GeoJSONSeq drivers, py-geopolars io/file.py:15-119).
 */
class GeoJsonSpec extends SparkSpec {

  private val f = Wkb.factory

  test("emit: all seven RFC 7946 geometry types") {
    assert(GeoJson.write(f.createPoint(new Coordinate(1.5, -2))) ==
      """{"type":"Point","coordinates":[1.5,-2]}""")
    assert(GeoJson.write(f.createLineString(Array(
      new Coordinate(0, 0), new Coordinate(1, 1)))) ==
      """{"type":"LineString","coordinates":[[0,0],[1,1]]}""")
    val box = Wkb.read(GeomKernel.stMakeBox(0, 0, 2, 1))
    assert(GeoJson.write(box) ==
      """{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,1],[0,1],[0,0]]]}""")
    assert(GeoJson.write(f.createMultiPointFromCoords(Array(
      new Coordinate(1, 2), new Coordinate(3, 4)))) ==
      """{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""")
    val mls = f.createMultiLineString(Array(
      f.createLineString(Array(new Coordinate(0, 0), new Coordinate(1, 0)))))
    assert(GeoJson.write(mls) ==
      """{"type":"MultiLineString","coordinates":[[[0,0],[1,0]]]}""")
    val mp = f.createMultiPolygon(Array(box.asInstanceOf[org.locationtech.jts.geom.Polygon]))
    assert(GeoJson.write(mp) ==
      """{"type":"MultiPolygon","coordinates":[[[[0,0],[2,0],[2,1],[0,1],[0,0]]]]}""")
    val gc = f.createGeometryCollection(Array(f.createPoint(new Coordinate(5, 6))))
    assert(GeoJson.write(gc) ==
      """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[5,6]}]}""")
  }

  test("polygon with hole round-trips exactly") {
    val shell = f.createLinearRing(Array(
      new Coordinate(0, 0), new Coordinate(10, 0), new Coordinate(10, 10),
      new Coordinate(0, 10), new Coordinate(0, 0)))
    val hole = f.createLinearRing(Array(
      new Coordinate(2, 2), new Coordinate(4, 2), new Coordinate(4, 4),
      new Coordinate(2, 4), new Coordinate(2, 2)))
    val p = f.createPolygon(shell, Array(hole))
    val back = GeoJson.read(GeoJson.write(p))
    assert(back.equalsExact(p))
  }

  test("parse: non-integer doubles round-trip bit-exactly") {
    val p = f.createPoint(new Coordinate(-73.98575493, 40.74856934))
    val back = GeoJson.read(GeoJson.write(p))
    assert(back.getCoordinate.x == p.getCoordinate.x)
    assert(back.getCoordinate.y == p.getCoordinate.y)
  }

  test("parse: Feature wrapper, Z ordinates ignored, empty point") {
    val g = GeoJson.read(
      """{"type":"Feature","properties":{"a":1},"geometry":
        |{"type":"Point","coordinates":[3.0, 4.0, 99.0]}}""".stripMargin)
    assert(g.getGeometryType == "Point")
    assert(g.getCoordinate.x == 3.0 && g.getCoordinate.y == 4.0)
    assert(GeoJson.read("""{"type":"Point","coordinates":[]}""").isEmpty)
  }

  test("parse rejects malformed input (fail-fast policy)") {
    intercept[IllegalArgumentException](GeoJson.read("""{"type":"Blob","coordinates":[]}"""))
    intercept[IllegalArgumentException](GeoJson.read("""[1,2,3]"""))
    intercept[Exception](GeoJson.read("""{"type":"Point","coordinates":"""))
  }

  test("st_asgeojson / st_geomfromgeojson round-trip WKB byte-identically (codegen)") {
    val df = spark.range(50).select(
      st_point(col("id") * 1.5 - 20.0, col("id") * -0.75 + 7.0).as("g"))
      .withColumn("j", st_asGeoJson(col("g")))
      .withColumn("g2", st_geomFromGeoJson(col("j")))
    assert(df.filter(col("g") =!= col("g2")).count() == 0)
    // boxes exercise the polygon path
    val boxes = spark.range(20).select(
      st_makeBox(col("id") * 1.0, lit(0.0), col("id") * 1.0 + 2.5, lit(4.25)).as("g"))
      .withColumn("g2", st_geomFromGeoJson(st_asGeoJson(col("g"))))
    assert(boxes.filter(col("g") =!= col("g2")).count() == 0)
  }

  test("geojson_feature: RS prefix, id forms, null geometry, bare geometry") {
    val lines = Seq(
      "\u001e{\"type\":\"Feature\",\"id\":7,\"properties\":{\"name\":\"x\"}," +
        "\"geometry\":{\"type\":\"Point\",\"coordinates\":[1,2]}}",
      "{\"type\":\"Feature\",\"id\":\"abc\",\"properties\":null,\"geometry\":null}",
      "{\"type\":\"Point\",\"coordinates\":[5,6]}")
    val df = spark.createDataFrame(lines.map(Tuple1(_))).toDF("value")
      .select(geojson_feature(col("value")).as("f"))
      .select(col("f.geometry").as("g"), col("f.properties").as("p"), col("f.id").as("id"))
    val rows = df.collect()
    assert(rows.length == 3)
    val r0 = rows(0)
    assert(GeomKernel.stX(r0.getAs[Array[Byte]](0)) == 1.0)
    assert(r0.getString(1) == """{"name":"x"}""")
    assert(r0.getString(2) == "7")
    val r1 = rows(1)
    assert(r1.isNullAt(0) && r1.getString(1) == "{}" && r1.getString(2) == "abc")
    val r2 = rows(2)
    assert(GeomKernel.stX(r2.getAs[Array[Byte]](0)) == 5.0 && r2.isNullAt(2))
  }

  test("writeGeoJsonSeq -> readGeoJsonSeq round-trip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("geojsonseq").toString
    val src = spark.range(100).select(
      col("id"),
      concat(lit("doc-"), col("id")).as("name"),
      (col("id") % 7 === 0).as("lucky"),
      st_point(col("id") * 0.5 - 10.0, col("id") * 0.25 + 1.0).as("geometry"))
    CellStore.writeGeoJsonSeq(src, dir)
    val back = CellStore.readGeoJsonSeq(spark, dir)
      .select(
        get_json_object(col("properties"), "$.id").cast("long").as("id"),
        get_json_object(col("properties"), "$.name").as("name"),
        get_json_object(col("properties"), "$.lucky").cast("boolean").as("lucky"),
        st_x(col("geometry")).as("x"), st_y(col("geometry")).as("y"))
    assert(back.count() == 100)
    val bad = back.filter(
      col("name") =!= concat(lit("doc-"), col("id")) ||
      col("lucky") =!= (col("id") % 7 === 0) ||
      col("x") =!= (col("id") * 0.5 - 10.0) ||
      col("y") =!= (col("id") * 0.25 + 1.0))
    assert(bad.count() == 0)
  }

  test("geojson_valid quarantines malformed lines; parse kernels stay fail-fast") {
    val lines = Seq(
      """{"type":"Feature","properties":{},"geometry":{"type":"Point","coordinates":[1,2]}}""",
      """{"type":"Point","coordinates":[5,6]}""",
      """{"type":"Blob","coordinates":[]}""",
      """not json at all""",
      """{"type":"Feature","geometry":{"type":"Point","coordinates":"oops"}}""")
    val df = spark.createDataFrame(lines.map(Tuple1(_))).toDF("value")
      .select(col("value"), geojson_valid(col("value")).as("ok"))
    assert(df.collect().map(_.getBoolean(1)).toSeq ==
      Seq(true, true, false, false, false))
    // quarantine-then-parse composes: only valid lines reach the kernel
    val parsed = df.filter(col("ok"))
      .select(geojson_feature(col("value")).as("f")).collect()
    assert(parsed.length == 2)
  }

  test("readGeoJson: one FeatureCollection document per file") {
    val dir = java.nio.file.Files.createTempDirectory("geojsonfc")
    val doc =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"n":1},"geometry":{"type":"Point","coordinates":[1,1]}},
        |{"type":"Feature","properties":{"n":2},"geometry":{"type":"Point","coordinates":[2,2]}},
        |{"type":"Feature","properties":{"n":3},"geometry":
        |  {"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}}
        |]}""".stripMargin
    java.nio.file.Files.write(dir.resolve("a.geojson"), doc.getBytes("UTF-8"))
    val df = CellStore.readGeoJson(spark, dir.toString)
      .select(get_json_object(col("properties"), "$.n").cast("int").as("n"),
        st_area(col("geometry")).as("area"))
    val rows = df.collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    assert(rows(2).getInt(0) == 3 && rows(2).getDouble(1) == 16.0)
  }
}
