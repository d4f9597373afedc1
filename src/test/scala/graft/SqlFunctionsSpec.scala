package graft

import graft.sql.GraftSql

/** SQL-surface coverage: every registered function is callable from
 *  spark.sql and agrees with the Column DSL. */
class SqlFunctionsSpec extends SparkSpec {

  test("all registered functions resolve and run from SQL") {
    GraftSql.register(spark)
    val row = spark.sql(
      """SELECT
        | st_area(st_makebox(0D, 0D, 4D, 2D)) AS area,
        | st_x(st_centroid(st_makebox(0D, 0D, 4D, 2D))) AS cx,
        | st_astext(st_point(1D, 2D)) AS wkt,
        | st_geomtype(st_geomfromtext('LINESTRING(0 0, 1 1)')) AS gt,
        | st_contains(st_makebox(0D,0D,10D,10D), st_point(5D,5D)) AS c,
        | st_distance(st_point(0D,0D), st_point(3D,4D)) AS d,
        | st_length(st_simplify(st_geomfromtext('LINESTRING(0 0, 5 0.001, 10 0)'), 1D)) AS slen,
        | st_area(st_intersection(st_makebox(0D,0D,10D,10D), st_makebox(5D,5D,20D,20D))) AS ia,
        | s2_cell(48.85D, 2.35D, 9) AS s2,
        | h3_cell(48.85D, 2.35D, 9) AS h3,
        | tile_x(2.35D, 8) AS tx,
        | lang_id('the quick study of the maps and the world') AS lang,
        | hamming64(7L, 5L) AS ham,
        | l2_norm(array(cast(3.0 as float), cast(4.0 as float))) AS nrm
        |""".stripMargin)
      .collect()(0)
    assert(row.getDouble(0) == 8.0)
    assert(row.getDouble(1) == 2.0)
    assert(row.getString(2) == "POINT (1 2)")
    assert(row.getInt(3) == 1)
    assert(row.getBoolean(4))
    assert(row.getDouble(5) == 5.0)
    assert(row.getDouble(6) == 10.0)
    assert(row.getDouble(7) == 25.0)
    assert(row.getLong(8) != 0L && row.getLong(9) != 0L)
    assert(row.getLong(10) == 129L)
    assert(row.getString(11) == "en")
    assert(row.getInt(12) == 1)
    assert(row.getDouble(13) == 5.0)
  }

  test("st_transform_crs and audio functions work from SQL") {
    GraftSql.register(spark)
    val row = spark.sql(
      """SELECT
        | st_x(st_transform_crs(st_point(11.6D, 48.1D), 'EPSG:4326',
        |   '+proj=merc +R=6378137')) AS mx,
        | audio_stats(wav_square(8000, 400, 250)).rms AS rms,
        | audio_stats(wav_square(8000, 400, 250)).n_frames AS n
        |""".stripMargin).collect()(0)
    assert(math.abs(row.getDouble(0) - 6378137.0 * math.toRadians(11.6)) < 1e-6)
    assert(row.getDouble(1) == 250.0)
    assert(row.getLong(2) == 400L)
  }

  test("id introspection functions: levels, resolutions, faces, tile zoom/parent") {
    GraftSql.register(spark)
    val row = spark.sql(
      """SELECT
        | s2_level(s2_cell(48.85D, 2.35D, 9)) AS lvl,
        | h3_res(h3_cell(48.85D, 2.35D, 9)) AS res,
        | h3_face(h3_cell(48.85D, 2.35D, 9)) AS face,
        | tile_zoom(tile_id(48.85D, 2.35D, 8)) AS z,
        | tile_parent(tile_id(48.85D, 2.35D, 8), 4) = tile_id(48.85D, 2.35D, 4) AS tp
        |""".stripMargin).collect()(0)
    assert(row.getInt(0) == 9 && row.getInt(1) == 9)
    assert(row.getInt(2) >= 0 && row.getInt(2) < 20)
    assert(row.getInt(3) == 8 && row.getBoolean(4))
  }

  test("st_union_agg works from SQL (group dissolve)") {
    GraftSql.register(spark)
    spark.sql(
      """SELECT id % 2 AS grp, st_makebox(cast(id*10 as double), 0D,
        | cast(id*10+5 as double), 5D) AS g FROM range(6)""".stripMargin)
      .createOrReplaceTempView("boxes")
    val rows = spark.sql(
      "SELECT grp, st_area(st_union_agg(g)) AS a FROM boxes GROUP BY grp ORDER BY grp")
      .collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getDouble(1) == 75.0)) // 3 disjoint 5x5 boxes each
  }

  test("wrong arity yields a clear error") {
    GraftSql.register(spark)
    val e = intercept[Exception](spark.sql("SELECT st_area()").collect())
    assert(e.getMessage.contains("st_area") || e.getMessage.contains("1"))
  }
}
