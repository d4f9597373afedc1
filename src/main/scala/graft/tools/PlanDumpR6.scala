package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 plan artifacts: `.explain("formatted")` of every headline bench
 *  query under the driver-standard bench session shape (local[32], 32
 *  shuffle partitions), written to plans/r06/<query>_<tag>.txt.
 *  Usage: runMain graft.tools.PlanDumpR6 <tag> [sfDir] [outDir] */
object PlanDumpR6 {
  private val headline = Seq(
    "q1_agg", "q3_revenue", "q_window_topn", "q_st_distance", "q_box_ops",
    "q_affine", "q_geodesic", "q_tile", "q_mercator", "q_spatial_join",
    "q_knn_points", "q_dedup_exact", "q_token_stats", "q_quality",
    "q_lsh_dup_pairs", "q_embed_norm", "q_knn_embed", "q_simplify",
    "q_hull_area", "q_s2_cells")

  /** Non-headline gate queries touched by the r6 spread() change. Their
   *  "before" plans are reproduced exactly by closing the spread size gate
   *  (cap=0 makes spread the identity, restoring the pre-r6 plan). */
  private val touchedExtra = Seq(
    "q_bounds_line", "q_geodesic_ell", "q_intersects_bbox", "q_overlay",
    "q_buffer", "q_utm", "q_proj_params", "q_laea", "q_albers", "q_lcc",
    "q_lcc1sp", "q_cyl", "q_omerc", "q_krovak", "q_sterea")

  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/r06"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // the gate conf is set EXPLICITLY for both touched modes: in a shared
    // session a prior touched_before run would otherwise leak cap=0 into
    // touched_after and silently record identical before/after plans
    val (names, conf) = tag match {
      case "touched_before" => (touchedExtra, Some("0"))               // gate closed
      case "touched_after"  => (touchedExtra, Some((256L << 20).toString)) // default
      case _                => (headline, None)
    }
    conf.foreach(v => spark.conf.set("spark.graft.spread.maxInputBytes", v))
    val suffix = tag.stripPrefix("touched_")
    names.foreach { name =>
      val txt = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
