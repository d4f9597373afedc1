package graft.tools
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"/tmp/qt_out/$name")
      println(f"QTC $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
