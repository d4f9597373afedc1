package graft.tools

import org.apache.spark.sql.SparkSession

/** Run named SparkEntry gate queries against an sf dir and print the result —
  * the quick local loop for checking a gate before the driver's DuckDB pass:
  * `runMain graft.tools.QGate /root/testdata/sf0.001 q_geojson q_cellstore_prune` */
object QGate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QGate <sfDir> <query...>")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, args(0))
      println(s"=== $name ===")
      df.show(20, truncate = false)
    }
    spark.stop()
  }
}
