package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of the headline queries for plan review. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("q_spatial_join", "q_knn_points", "q1_agg", "q_lsh_dup_pairs",
      "q_st_distance", "q_tile")
    interesting.foreach { name =>
      println(s"\n===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    println("\n===== pipeline =====")
    println(graft.pipeline.GeoPipeline.build(spark, 1000, 42, 4).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
