package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-scaling probe: a pure-compute job (no allocation, no shuffle) to
 *  establish the achievable parallel speedup on this host. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Double = {
      val t0 = System.nanoTime()
      // 8 chained xxhash64 rounds per row: ~40 ns of pure ALU work per row
      val c = (1 to 8).foldLeft(col("id"))((acc, _) => xxhash64(acc))
      spark.range(0, n, 1, 64).select(max(c)).collect()
      n / ((System.nanoTime() - t0) / 1e9)
    }
    run() // warmup
    val best = (1 to 3).map(_ => run()).max
    println(f"ROWS_PER_SEC $best%.0f")
    spark.stop()
  }
}
