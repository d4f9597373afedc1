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

  test("readFile: columns/where/bbox/maxFeatures map to pushdowns (io/file.py parity)") {
    val path = Files.createTempDirectory("readfile").toString
    val geo = Pages.geocode(Pages.generate(spark, 2000, 42, 8), Pages.gazetteer(spark))
      .select("url", "lang", "lat", "lon", "s2_cell", "text")
    CellStore.write(geo, path, partLevel = 4)

    val rf = CellStore.readFile(spark, path,
      columns = Seq("url", "lat", "lon"),
      where = Some("lang = 'en' AND lat > -20 AND lat < 20"),
      bbox = Some((-20.0, -60.0, 20.0, 20.0)))
    // rows: exactly the where-filtered rows within the bbox covering
    val expect = CellStore.readBbox(spark, path, -20, -60, 20, 20)
      .filter(col("lang") === "en" && col("lat") > -20 && col("lat") < 20)
      .select("url").collect().map(_.getString(0)).toSet
    assert(expect.nonEmpty)
    assert(rf.collect().map(_.getString(0)).toSet == expect)
    assert(rf.columns.toSeq == Seq("url", "lat", "lon"))
    // plan: predicate pushed to the scan, projection pruned (no text bytes)
    val plan = rf.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(lang,en)"), s"where not pushed:\n$plan")
    assert(!plan.contains("text"), "projection pruning failed: text still read")
    // maxFeatures -> a plain limit
    assert(CellStore.readFile(spark, path, maxFeatures = Some(7)).count() == 7)
    // maxFeatures beyond Int.MaxValue clamps instead of wrapping negative
    assert(CellStore.readFile(spark, path,
      maxFeatures = Some(Long.MaxValue)).count() == geo.count())
    // no bbox, no where: whole relation
    assert(CellStore.readFile(spark, path).count() == geo.count())
  }

  test("readFile: fids/sql/return_fids map honestly (io/file.py:27-30,104-107)") {
    val path = Files.createTempDirectory("readfile_fids").toString
    val geo = Pages.geocode(Pages.generate(spark, 500, 42, 4), Pages.gazetteer(spark))
      .select("url", "lang", "lat", "lon", "s2_cell")
      .withColumn("fid", xxhash64(col("url"))) // engine's driver-specific FID
    CellStore.write(geo, path, partLevel = 4)
    val someFids = geo.select("fid").limit(5).collect().map(_.getLong(0)).toSeq

    // fids -> IN-list pushdown on the fid column, exactly those rows back
    val byFid = CellStore.readFile(spark, path, fids = Some(someFids))
    assert(byFid.select("fid").collect().map(_.getLong(0)).toSet == someFids.toSet)
    assert(byFid.queryExecution.executedPlan.toString.contains("In(fid"),
      "fids filter not pushed to the scan")
    // fids cannot combine with where/bbox/maxFeatures (reference contract)
    intercept[IllegalArgumentException] {
      CellStore.readFile(spark, path, fids = Some(someFids), where = Some("lang='en'"))
    }

    // sql -> full Spark SQL over the registered view; dialect guard refuses
    val bySql = CellStore.readFile(spark, path,
      sql = Some("SELECT lang, count(*) AS n FROM read_file GROUP BY lang"))
    assert(bySql.collect().map(_.getLong(1)).sum == 500L)
    intercept[IllegalArgumentException] {
      CellStore.readFile(spark, path, sql = Some("SELECT 1"), sqlDialect = "OGRSQL")
    }

    // return_fids appends fid even when columns omitted it
    val rf = CellStore.readFile(spark, path, columns = Seq("url", "lang"),
      fidCol = "fid", returnFids = true)
    assert(rf.columns.contains("fid") && rf.columns.contains("url"))
    assert(rf.count() == 500)

    // read_geometry=False drops the geometry column (file.py:54-56)
    val path2 = Files.createTempDirectory("readfile_geom").toString
    geo.withColumn("geometry", graft.functions.st.st_point(col("lon"), col("lat")))
      .write.mode("overwrite").parquet(path2)
    val noGeom = CellStore.readFile(spark, path2, readGeometry = false)
    assert(!noGeom.columns.contains("geometry") && noGeom.count() == 500)
    assert(CellStore.readFile(spark, path2).columns.contains("geometry"))
  }

  test("bucketed tables join with zero exchanges (co-located join layout)") {
    val wh = Files.createTempDirectory("bucketed_wh").toString
    val geo = Pages.geocode(Pages.generate(spark, 1500, 42, 8), Pages.gazetteer(spark))
      .select("url", "s2_cell")
    CellStore.writeBucketed(geo, "pages_a", wh, nBuckets = 8)
    CellStore.writeBucketed(geo.withColumnRenamed("url", "url_b"), "pages_b", wh, nBuckets = 8)
    // force the join strategy that bucketing co-locates (tiny test tables
    // would otherwise broadcast and bypass the bucketed layout entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("pages_a").join(spark.table("pages_b"), "s2_cell")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed read not used:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // and the bucketed table round-trips all rows
    assert(spark.table("pages_a").count() == geo.count())
    spark.sql("DROP TABLE IF EXISTS pages_a")
    spark.sql("DROP TABLE IF EXISTS pages_b")
  }
}
