package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.join.AsofJoin

/**
 * A/B: plain as-of (one window per key — a hyper-hot key runs as ONE sorted
 * task) vs the bucketed two-pass variant (window keyed by (key, time
 * bucket) — the hot key spreads over its buckets). Usage:
 *   runMain graft.tools.AsofSkewBench [cores] [rows] [hotFrac%]
 */
object AsofSkewBench {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 4000000L
    val hotPct = if (args.length > 2) args(2).toInt else 90
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // left: n events, hotPct% on ONE key, timestamps over ~46 days (seconds)
    val left = spark.range(0, n, 1, 64).select(
      col("id"),
      when(pmod(xxhash64(col("id")), lit(100)) < hotPct, lit(7L))
        .otherwise(pmod(xxhash64(col("id") + 1), lit(1000))).as("k"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id") + 2), lit(4000000L)))
        .as("ts"))
    // right: sparse snapshots per key
    val right = spark.range(0, 20000, 1, 8).select(
      pmod(xxhash64(col("id")), lit(1000)).as("k"),
      timestamp_seconds(lit(1700000000L) + pmod(xxhash64(col("id") + 3), lit(4000000L)))
        .as("ts"),
      col("id").as("snap"))
      .groupBy("k", "ts").agg(min("snap").as("snap"))

    def run(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (0 until 2).map { _ =>
        val t0 = System.nanoTime(); force(df); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"ASOF $tag rows=$n hot=$hotPct%% best=$secs%.2f s")
    }
    // warm-up both plans
    force(AsofJoin.join(left.limit(100000), right, "k", "ts", Seq("snap")))
    force(AsofJoin.joinBucketed(left.limit(100000), right, "k", "ts", Seq("snap"),
      c => floor(c.cast("long") / 86400L).cast("long")))

    run("plain_window")(AsofJoin.join(left, right, "k", "ts", Seq("snap")))
    run("bucketed_daily")(AsofJoin.joinBucketed(left, right, "k", "ts", Seq("snap"),
      c => floor(c.cast("long") / 86400L).cast("long")))
    spark.stop()
  }
}
