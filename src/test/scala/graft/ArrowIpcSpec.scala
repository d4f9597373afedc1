package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.st
import graft.sources.ArrowIpc

/** The reference's four golden Arrow IPC datasets, read with the engine's
 *  distributed reader — row counts and shapes pinned to the reference's own
 *  test expectations. */
class ArrowIpcSpec extends SparkSpec {

  val RefData = "/root/reference/data"
  val RefDatasets = "/root/reference/py-geopolars/python/geopolars/datasets"

  test("cities.arrow: 202 rows of (name, wkb point) — the affine bench input") {
    // reference benches/affine.rs:23-31 runs translate(10,10) over this file
    val df = ArrowIpc.read(spark, s"$RefData/cities.arrow")
    assert(df.schema == StructType(Seq(
      StructField("name", StringType, nullable = true),
      StructField("geometry", BinaryType, nullable = true))))
    assert(df.count() == 202)
    val typed = df.select(st.st_geomType(col("geometry")).as("t")).distinct().collect()
    assert(typed.map(_.getInt(0)).toSeq == Seq(0)) // all Points (pygeos id 0)
  }

  test("naturalearth_cities (243 rows, the conftest.py:7 fixture) and " +
    "naturalearth_lowres (177 countries) parse with valid geometries") {
    val cities = ArrowIpc.read(spark, s"$RefDatasets/naturalearth_cities.arrow")
    assert(cities.count() == 243) // test_geoseries.py:4-5 pins this
    val countries = ArrowIpc.read(spark, s"$RefDatasets/naturalearth_lowres.arrow")
    assert(countries.count() == 177)
    // every geometry parses through the quarantine predicate
    assert(countries.filter(!st.st_is_valid_wkb(col("geometry"))).count() == 0)
    assert(cities.filter(!st.st_is_valid_wkb(col("geometry"))).count() == 0)
    // countries are polygonal; centroid must fall inside the bounds
    val bad = countries.select(
      st.st_bounds(col("geometry")).as("b"),
      st.st_x(st.st_centroid(col("geometry"))).as("cx"))
      .filter(col("cx") < col("b.minx") || col("cx") > col("b.maxx"))
    assert(bad.count() == 0)
  }

  test("nybb.arrow: uint8 widens losslessly; multiple files union by schema") {
    val nybb = ArrowIpc.read(spark, s"$RefDatasets/nybb.arrow")
    assert(nybb.count() == 5)
    assert(nybb.schema("BoroCode").dataType == ShortType) // arrow uint8
    assert(nybb.select("BoroCode").collect().map(_.getShort(0)).sorted.toSeq ==
      Seq[Short](1, 2, 3, 4, 5))
    // two-file read: schema check enforced, rows concatenated
    val both = ArrowIpc.read(spark,
      s"$RefData/cities.arrow", s"$RefDatasets/naturalearth_cities.arrow")
    assert(both.count() == 202 + 243)
  }
}
