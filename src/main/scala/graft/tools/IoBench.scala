package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Interchange-driver throughput A/B at local[32]: parquet vs Arrow IPC vs
 * GeoJSONSeq vs Shapefile, same synthetic point layer, write then full-scan
 * read (noop sink), best of `reps` warm passes. Quantifies what the format
 * choice costs at ingest/export time — parquet/IPC are the bulk paths, the
 * text/dbf drivers are interchange; the numbers in BENCH.md record the gap.
 * `runMain graft.tools.IoBench [rows] [reps]`
 */
object IoBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.st._

    val root = java.nio.file.Files.createTempDirectory("iobench").toString
    val df = spark.range(0, rows, 1, 32).select(
      col("id"),
      concat(lit("doc-"), col("id")).as("name"),
      (col("id") % 36000 / 100.0 - 180.0 + 0.005).as("lon"),
      (col("id") % 17000 / 100.0 - 85.0 + 0.005).as("lat"))
      .withColumn("geometry", st_point(col("lon"), col("lat")))
      .persist()
    val n = df.count() // materialize the input once

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Unit): Double = (0 until reps).map(_ => time(f)).min
    def force(d: DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    val dirs = Map(
      "parquet" -> s"$root/pq", "arrowipc" -> s"$root/ipc",
      "geojsonseq" -> s"$root/gj", "shapefile" -> s"$root/shp")

    val writes = Seq(
      "parquet" -> (() => df.write.mode("overwrite").parquet(dirs("parquet"))),
      "arrowipc" -> (() => graft.sources.ArrowIpc.write(df, dirs("arrowipc"))),
      "geojsonseq" -> (() => graft.sources.CellStore.writeGeoJsonSeq(df, dirs("geojsonseq"))),
      "shapefile" -> (() => graft.sources.Shapefile.write(df, dirs("shapefile"))))
    val wRes = writes.map { case (name, w) => name -> best(w()) }

    def ipcParts = new java.io.File(dirs("arrowipc")).listFiles()
      .filter(_.getName.endsWith(".arrow")).map(_.getPath).toIndexedSeq
    val reads = Seq(
      "parquet" -> (() => force(spark.read.parquet(dirs("parquet")))),
      "arrowipc" -> (() => force(graft.sources.ArrowIpc.read(spark, ipcParts: _*))),
      "geojsonseq" -> (() => force(graft.sources.CellStore.readGeoJsonSeq(spark, dirs("geojsonseq")))),
      "shapefile" -> (() => force(graft.sources.Shapefile.read(spark, dirs("shapefile")))))
    val rRes = reads.map { case (name, r) => name -> best(r()) }

    def dirBytes(p: String): Long =
      new java.io.File(p).listFiles().map(_.length()).sum
    println("IOBENCH rows=" + n)
    wRes.zip(rRes).foreach { case ((name, w), (_, r)) =>
      val mb = dirBytes(dirs(name)) / 1e6
      println(f"IOBENCH $name%-10s size=$mb%8.1fMB write=$w%7.2fs (${n / w / 1e6}%5.2fM rows/s)" +
        f" read=$r%7.2fs (${n / r / 1e6}%5.2fM rows/s)")
    }
    spark.stop()
  }
}
