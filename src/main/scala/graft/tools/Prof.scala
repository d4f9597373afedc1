package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pages.Pages
import graft.pipeline.GeoPipeline
import graft.join.{SpatialJoin, SpatialPredicate}

/** Scratch profiler: times each pipeline stage at a given core count. */
object Prof {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 32))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val parts = 64
    // warmup
    force(GeoPipeline.build(spark, 20000, 7, parts))

    time("gen-only")(force(Pages.generate(spark, n, 42, parts)))
    time("gen+geocode")(force(Pages.geocode(Pages.generate(spark, n, 42, parts),
      Pages.gazetteer(spark))))
    val geo = Pages.geocode(Pages.generate(spark, n, 42, parts), Pages.gazetteer(spark))
      .select("url", "warc_ts", "lang", "geometry", "s2_cell", "tile_z4", "tile_z8", "tile_z12")
    time("full-join")(force(SpatialJoin.join(geo, GeoPipeline.adminLayer(spark),
      SpatialPredicate.Intersects, "inner", cellLevel = 9)))
    time("full-again")(force(GeoPipeline.build(spark, n, 42, parts)))
    spark.stop()
  }
}
