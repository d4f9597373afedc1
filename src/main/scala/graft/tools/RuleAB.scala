package graft.tools

import org.apache.spark.sql.SparkSession

/** VERDICT r5 #1 closure: A/B the headline query block with and without the
 *  engine's optimizer rule (SpatialJoinRule) registered, interleaved in one
 *  JVM so host-steal bursts decorrelate from the toggle. The bench JVM never
 *  registers the rule (registerRules is called only by the three rule-gate
 *  builders, none in the block), so the expectation is NO difference beyond
 *  noise — this records that expectation as data.
 *  Usage: runMain graft.tools.RuleAB [passesPerArm] */
object RuleAB {
  private val headline = Seq(
    "q1_agg", "q3_revenue", "q_window_topn", "q_st_distance", "q_box_ops",
    "q_affine", "q_geodesic", "q_tile", "q_mercator", "q_spatial_join",
    "q_knn_points", "q_dedup_exact", "q_token_stats", "q_quality",
    "q_lsh_dup_pairs", "q_embed_norm", "q_knn_embed", "q_simplify",
    "q_hull_area", "q_s2_cells")

  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def setRule(on: Boolean): Unit =
      spark.experimental.extraOptimizations =
        if (on) Seq(graft.sql.SpatialJoinRule) else Nil

    def block(): Double = headline.map { name =>
      val t0 = System.nanoTime()
      force(graft.SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }.sum

    // warm both arms, then interleave OFF/ON passes; report best-of per arm
    setRule(false); block()
    setRule(true); block()
    val offs = collection.mutable.ArrayBuffer[Double]()
    val ons = collection.mutable.ArrayBuffer[Double]()
    (0 until passes).foreach { _ =>
      setRule(false); offs += block()
      setRule(true); ons += block()
    }
    setRule(false)
    println(f"RULEAB off_best=${offs.min}%.3f on_best=${ons.min}%.3f " +
      f"off_all=${offs.map(v => f"$v%.2f").mkString(",")} " +
      f"on_all=${ons.map(v => f"$v%.2f").mkString(",")}")
    spark.stop()
  }
}
