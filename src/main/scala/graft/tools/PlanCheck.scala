package graft.tools

import org.apache.spark.sql.SparkSession

/** Print compact physical plans for the round's new queries. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dwithin_join", "q_asof_join", "q_heavy_hitters", "q_embed_dedup")
    names.foreach { n =>
      println(s"===== $n =====")
      val plan = graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate") ||
          l.contains("Window") || l.contains("Scan") || l.contains("Sort"))
        .foreach(l => println(l.take(160)))
    }
    spark.stop()
  }
}
