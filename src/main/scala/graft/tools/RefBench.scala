package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The reference's own two criterion bench workloads, reproduced exactly
 * (geopolars/benches/affine.rs:23-31, explode.rs:10-31) — the reference
 * publishes no numbers (its `translate` kernel body is `todo!()`, so its
 * harness cannot even run), so these are the numbers for that workload.
 *
 * Two grains per workload, because criterion times a bare kernel loop while
 * this engine's unit of work is a distributed job:
 *   kernel — tight driver loop over the same kernel functions Spark's
 *            codegen calls (StaticInvoke targets), criterion-comparable
 *   spark  — the same work as a local[*] job through the full engine
 *            (plan + schedule + codegen), the engine's real grain
 */
object RefBench {
  private def bestOf[T](n: Int)(f: => T): Double =
    (0 until n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 200
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.st._

    // ---- translate (affine.rs:23-26): translate(10,10) over cities.arrow ----
    val cities = graft.sources.ArrowIpc.read(spark, "/root/reference/data/cities.arrow")
    val wkbs = cities.select("geometry").collect().map(_.getAs[Array[Byte]](0))
    require(wkbs.length == 202)
    // criterion-comparable: the kernel loop (202 translates per iteration)
    val kt = bestOf(5) {
      var it = 0
      while (it < iters) {
        var i = 0
        while (i < wkbs.length) {
          graft.geom.GeomKernel.stTranslate(wkbs(i), 10.0, 10.0); i += 1
        }
        it += 1
      }
    } / iters
    println(f"REFBENCH translate kernel_per_iter_us=${kt * 1e6}%.1f " +
      f"geoms_per_sec=${wkbs.length / kt}%.0f")
    // engine grain: same workload as a job (includes everything)
    cities.cache().count()
    val st = bestOf(5) {
      cities.select(st_translate(col("geometry"), lit(10.0), lit(10.0)).as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    println(f"REFBENCH translate spark_job_sec=$st%.4f")

    // ---- explode (explode.rs:10-31): 45k MultiPoints(2) -> 90k points ----
    val mpWkb = {
      val f = graft.geom.Wkb.factory
      graft.geom.Wkb.write(f.createMultiPoint(
        Array(f.createPoint(new org.locationtech.jts.geom.Coordinate(0, 0)),
          f.createPoint(new org.locationtech.jts.geom.Coordinate(0, 0)))))
    }
    val mps = Array.fill(45000)(mpWkb)
    val ke = bestOf(5) {
      var i = 0
      var n = 0
      while (i < mps.length) {
        n += graft.geom.GeomKernel.stDump(mps(i)).numElements(); i += 1
      }
      require(n == 90000)
    }
    println(f"REFBENCH explode kernel_sec=$ke%.4f multipoints_per_sec=${mps.length / ke}%.0f")
    val mpDf = spark.range(0, 45000, 1, 32).select(lit(mpWkb).as("geometry")).cache()
    mpDf.count()
    val se = bestOf(5) {
      val n = mpDf.select(explode(st_dump(col("geometry"))).as("g")).count()
      require(n == 90000)
    }
    println(f"REFBENCH explode spark_job_sec=$se%.4f points_per_sec=${90000 / se}%.0f")
    spark.stop()
  }
}
