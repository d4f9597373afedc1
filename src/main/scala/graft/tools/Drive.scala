package graft.tools

import org.apache.spark.sql.SparkSession

/** Verification driver: exercises the public API surface end-to-end. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.SparkEntry.entry(spark)
    println(s"ENTRY_ROWS ${e.count()} COLS ${e.columns.take(4).mkString(",")}")
    val root = java.nio.file.Files.createTempDirectory("drive_snap").toString
    val r1 = graft.pipeline.GeoPipeline.run(spark, 3000, 42, 4, snapshotRoot = Some(root))
    val id1 = graft.snapshot.Snapshot.currentId(root)
    val r2 = graft.pipeline.GeoPipeline.run(spark, 3000, 42, 4, snapshotRoot = Some(root))
    val id2 = graft.snapshot.Snapshot.currentId(root)
    println(s"SNAP rows1=${r1.rows} rows2=${r2.rows} id1=$id1 id2=$id2 resumed=${id1 == id2}")
    println("METRICS " + spark.read.parquet(s"$root/metrics/snap-1").columns.mkString(","))
    val plan = graft.pipeline.GeoPipeline.build(spark, 1000, 1, 2)
      .queryExecution.executedPlan.toString
    println("PLAN_BNLJ=" + plan.contains("BroadcastNestedLoop") +
      " PLAN_BHJ=" + plan.contains("BroadcastHashJoin"))
    spark.stop()
  }
}
