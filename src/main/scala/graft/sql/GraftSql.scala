package graft.sql

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.st
import graft.expr.UnionAgg

/**
 * SQL registration for the engine's functions: makes every operator usable
 * from `spark.sql("SELECT st_area(geom) ...")` in addition to the Column DSL.
 * Builders delegate to the DSL (single source of truth for kernel signatures
 * and casts). Register per session via `GraftSql.register(spark)`, or
 * configure `spark.sql.extensions=graft.sql.GraftSparkExtensions` so every
 * session in a cluster gets them at startup.
 */
object GraftSql {

  /** name -> (arity, Column-level builder). */
  val functions: Map[String, (Int, Seq[Column] => Column)] = Map(
    "st_point" -> (2, a => st.st_point(a(0), a(1))),
    "st_makebox" -> (4, a => st.st_makeBox(a(0), a(1), a(2), a(3))),
    "st_makeline" -> (4, a => st.st_makeLine(a(0), a(1), a(2), a(3))),
    "st_geomfromtext" -> (1, a => st.st_geomFromText(a(0))),
    "st_astext" -> (1, a => st.st_asText(a(0))),
    "st_area" -> (1, a => st.st_area(a(0))),
    "st_centroid" -> (1, a => st.st_centroid(a(0))),
    "st_convexhull" -> (1, a => st.st_convexHull(a(0))),
    "st_envelope" -> (1, a => st.st_envelope(a(0))),
    "st_bounds" -> (1, a => st.st_bounds(a(0))),
    "st_length" -> (1, a => st.st_length(a(0))),
    "st_exterior" -> (1, a => st.st_exterior(a(0))),
    "st_geomtype" -> (1, a => st.st_geomType(a(0))),
    "st_isempty" -> (1, a => st.st_isEmpty(a(0))),
    "st_force2d" -> (1, a => st.st_force2d(a(0))),
    "st_asgeojson" -> (1, a => st.st_asGeoJson(a(0))),
    "st_geomfromgeojson" -> (1, a => st.st_geomFromGeoJson(a(0))),
    "geojson_feature" -> (1, a => st.geojson_feature(a(0))),
    "geojson_collection" -> (1, a => st.geojson_collection(a(0))),
    "geojson_valid" -> (1, a => st.geojson_valid(a(0))),
    "st_is_valid_wkb" -> (1, a => st.st_is_valid_wkb(a(0))),
    "st_isring" -> (1, a => st.st_isRing(a(0))),
    "st_x" -> (1, a => st.st_x(a(0))),
    "st_y" -> (1, a => st.st_y(a(0))),
    "st_distance" -> (2, a => st.st_distance(a(0), a(1))),
    "st_contains" -> (2, a => st.st_contains(a(0), a(1))),
    "st_intersects" -> (2, a => st.st_intersects(a(0), a(1))),
    "st_within" -> (2, a => st.st_within(a(0), a(1))),
    "st_translate" -> (3, a => st.st_translate(a(0), a(1), a(2))),
    "st_rotate" -> (5, a => st.st_rotate(a(0), a(1), a(2), a(3), a(4))),
    "st_scale" -> (6, a => st.st_scale(a(0), a(1), a(2), a(3), a(4), a(5))),
    "st_skew" -> (6, a => st.st_skew(a(0), a(1), a(2), a(3), a(4), a(5))),
    "st_affine" -> (7, a => st.st_affine(a(0), a(1), a(2), a(3), a(4), a(5), a(6))),
    "st_union" -> (2, a => st.st_union(a(0), a(1))),
    "st_intersection" -> (2, a => st.st_intersection(a(0), a(1))),
    "st_difference" -> (2, a => st.st_difference(a(0), a(1))),
    "st_symdifference" -> (2, a => st.st_symDifference(a(0), a(1))),
    "st_buffer" -> (2, a => st.st_buffer(a(0), a(1))),
    "st_dump" -> (1, a => st.st_dump(a(0))),
    "st_simplify" -> (2, a => st.st_simplify(a(0), a(1))),
    "st_transform" -> (3, a => st.st_transform(a(0), a(1), a(2))),
    "st_union_agg" -> (1, a => UnionAgg.st_union_agg(a(0))),
    "s2_cell" -> (3, a => st.s2_cell(a(0), a(1), a(2))),
    "s2_parent" -> (2, a => st.s2_parent(a(0), a(1))),
    "h3_cell" -> (3, a => st.h3_cell(a(0), a(1), a(2))),
    "h3_parent" -> (2, a => st.h3_parent(a(0), a(1))),
    "tile_id" -> (3, a => st.tile_id(a(0), a(1), a(2))),
    "tile_x" -> (2, a => st.tile_x(a(0), a(1))),
    "tile_y" -> (2, a => st.tile_y(a(0), a(1))),
    "haversine_m" -> (4, a => st.haversine_m(a(0), a(1), a(2), a(3))),
    "extract_text" -> (1, a => st.extract_text(a(0))),
    "lang_id" -> (1, a => st.lang_id(a(0))),
    "fingerprint64" -> (1, a => st.fingerprint64(a(0))),
    "simhash64" -> (2, a => st.simhash64(a(0), a(1))),
    "hamming64" -> (2, a => st.hamming64(a(0), a(1))),
    "minhash_band" -> (5, a => st.minhash_band(a(0), a(1), a(2), a(3), a(4))),
    "jaccard_shingles" -> (3, a => st.jaccard_shingles(a(0), a(1), a(2))),
    "cosine_sim" -> (2, a => st.cosine_sim(a(0), a(1))),
    "l2_norm" -> (1, a => st.l2_norm(a(0))),
    "cosine_lsh_bucket" -> (2, a => st.cosine_lsh_bucket(a(0), a(1))),
    "cosine_lsh_probes" -> (3, a => st.cosine_lsh_probes(a(0), a(1), a(2))),
    "minhash_bands" -> (4, a => st.minhash_bands(a(0), a(1), a(2), a(3))),
    "text_stats" -> (1, a => st.text_stats(a(0))),
    "utm_srid" -> (2, a => st.utm_srid(a(0), a(1))),
    "st_point_native" -> (1, a => st.st_point_native(a(0))),
    "st_line_native" -> (1, a => st.st_line_native(a(0))),
    "st_polygon_native" -> (1, a => st.st_polygon_native(a(0))),
    "st_from_point_native" -> (1, a => st.st_from_point_native(a(0))),
    "st_from_line_native" -> (1, a => st.st_from_line_native(a(0))),
    "st_from_polygon_native" -> (1, a => st.st_from_polygon_native(a(0))),
    "png_const" -> (5, a => st.png_const(a(0), a(1), a(2), a(3), a(4))),
    "img_stats" -> (1, a => st.img_stats(a(0))),
    "img_resize" -> (3, a => st.img_resize(a(0), a(1), a(2))),
    "st_geodesiclength" -> (2, a => st.st_geodesicLength(a(0), a(1))),
    "token_count_bpe" -> (1, a => st.token_count_bpe(a(0))),
    "tile_bounds" -> (1, a => st.tile_bounds(a(0))),
    "tile_polygon" -> (1, a => st.tile_polygon(a(0))),
    "st_transform_crs" -> (3, a => st.st_transform_crs(a(0), a(1), a(2))),
    "wav_square" -> (3, a => st.wav_square(a(0), a(1), a(2))),
    "audio_stats" -> (1, a => st.audio_stats(a(0))),
    "tile_zoom" -> (1, a => st.tile_zoom(a(0))),
    "tile_parent" -> (2, a => st.tile_parent(a(0), a(1))),
    "st_dwithin" -> (3, a => st.st_dwithin(a(0), a(1), a(2))),
    "s2_level" -> (1, a => st.s2_level(a(0))),
    "h3_res" -> (1, a => st.h3_res(a(0))),
    "h3_face" -> (1, a => st.h3_face(a(0))),
    "st_multipoint_native" -> (1, a => st.st_multipoint_native(a(0))),
    "st_multiline_native" -> (1, a => st.st_multiline_native(a(0))),
    "st_multipolygon_native" -> (1, a => st.st_multipolygon_native(a(0))),
    "st_from_multipoint_native" -> (1, a => st.st_from_multipoint_native(a(0))),
    "st_from_multiline_native" -> (1, a => st.st_from_multiline_native(a(0))),
    "st_from_multipolygon_native" -> (1, a => st.st_from_multipolygon_native(a(0))),
    "avi_gradient" -> (8, a => st.avi_gradient(a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7))),
    "video_stats" -> (1, a => st.video_stats(a(0))),
    "video_frame_stats" -> (2, a => st.video_frame_stats(a(0), a(1))),
    "video_frame_png" -> (2, a => st.video_frame_png(a(0), a(1))),
    "winnow_fingerprints" -> (3, a => st.winnow_fingerprints(a(0), a(1), a(2))),
    "h3_disk" -> (4, a => st.h3_disk(a(0), a(1), a(2), a(3))))

  /** Register all functions into an existing session's catalog. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, (arity, builder)) =>
      Bridge.registerFunction(spark, name, { exprs =>
        require(exprs.length == arity, s"$name expects $arity args, got ${exprs.length}")
        Bridge.toCatalyst(builder(exprs.map(Bridge.column)))
      })
    }

  /** Register the engine's optimizer rules (SpatialJoinRule: naive
   *  distance-join BNLJ -> cell-bucketed hash join) into a live session. */
  def registerRules(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(SpatialJoinRule))
      exp.extraOptimizations = exp.extraOptimizations :+ SpatialJoinRule
  }
}

/** For `spark.sql.extensions=graft.sql.GraftSparkExtensions`. */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftSql.functions.foreach { case (name, (arity, builder)) =>
      Bridge.injectFunction(ext, name, { exprs =>
        require(exprs.length == arity, s"$name expects $arity args, got ${exprs.length}")
        Bridge.toCatalyst(builder(exprs.map(Bridge.column)))
      })
    }
    ext.injectOptimizerRule(_ => SpatialJoinRule)
  }
}
