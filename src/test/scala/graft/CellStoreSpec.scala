package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.pages.Pages
import graft.sources.CellStore

class CellStoreSpec extends SparkSpec {

  test("cell-partitioned layout: bbox read prunes partitions and loses no rows") {
    val path = Files.createTempDirectory("cellstore").toString
    val geo = Pages.geocode(Pages.generate(spark, 2000, 42, 8), Pages.gazetteer(spark))
      .select("url", "lat", "lon", "s2_cell")
    CellStore.write(geo, path, partLevel = 4)

    // partition directories exist
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith(CellStore.PartCol + "="))
    assert(dirs.length > 1, s"expected multiple cell partitions, got ${dirs.length}")

    val bbox = (-20.0, -60.0, 20.0, 20.0) // (minLat, minLon, maxLat, maxLon)
    val pruned = CellStore.readBbox(spark, path, bbox._1, bbox._2, bbox._3, bbox._4)

    // completeness: every row inside the bbox is present in the pruned read
    val expected = geo.filter(col("lat") >= bbox._1 && col("lat") <= bbox._3 &&
      col("lon") >= bbox._2 && col("lon") <= bbox._4).select("url").collect().map(_.getString(0)).toSet
    val got = pruned.filter(col("lat") >= bbox._1 && col("lat") <= bbox._3 &&
      col("lon") >= bbox._2 && col("lon") <= bbox._4).select("url").collect().map(_.getString(0)).toSet
    assert(expected.nonEmpty && got == expected)

    // pruning: the executed scan reads strictly fewer files than a full scan
    // (inputFiles lists the whole relation; the scan metric shows pruning)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.getOrElse(-1L)
    }
    val allFiles = filesRead(spark.read.parquet(path))
    val prunedFiles = filesRead(CellStore.readBbox(spark, path, bbox._1, bbox._2, bbox._3, bbox._4))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"expected partition pruning: $prunedFiles vs $allFiles files")
  }

  test("filter/projection pushdown reaches the parquet scan") {
    val path = Files.createTempDirectory("pushdown").toString
    val geo = Pages.geocode(Pages.generate(spark, 500, 7, 4), Pages.gazetteer(spark))
      .select("url", "lang", "lat", "lon", "s2_cell", "text")
    geo.write.mode("overwrite").parquet(path)
    val q = spark.read.parquet(path).filter(col("lang") === "en").select("url", "lat")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("text"),
      "projection pruning failed: text column still read")
  }
}
