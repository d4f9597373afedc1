package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-style warm timing of individual gate queries (warm-up run, then N
 *  timed noop-sink runs) for A/B experiments: `runMain graft.tools.ABQuery
 *  <reps> <query>...` on SPARK_GRAFT_SF_DIR (default sf0.1). */
object ABQuery {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      force(fn(spark, dir)) // warm-up
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ABQ $name best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
