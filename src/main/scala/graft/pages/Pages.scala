package graft.pages

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.st

/**
 * The web-pages table and its geocoding pipeline (BASELINE.json input_hint:
 * `url string, warc_ts timestamp, html binary, text string, lang string`).
 * Generation is a deterministic function of (row id, seed): synthesized
 * lazily with `spark.range` so a 10^12-row table is a plan, not a download —
 * rows materialize partition-parallel on executors.
 */
object Pages {

  private def inv(name: String, dt: DataType, args: (Column, DataType)*): Column =
    Bridge.column(StaticInvoke(PagesKernel.getClass, dt, name,
      args.map { case (c, t) => Bridge.expression(c.cast(t)) }, args.map(_._2),
      propagateNull = true, returnNullable = true))

  /** Synthesize `n` pages with `numPartitions` parallelism. */
  def generate(spark: SparkSession, n: Long, seed: Long, numPartitions: Int): DataFrame = {
    spark.range(0, n, 1, numPartitions).select(
      inv("synthUrl", StringType, col("id") -> LongType, lit(seed) -> LongType).as("url"),
      (timestamp_seconds(lit(1696118400L) + col("id") % 86400)).as("warc_ts"),
      inv("synthHtml", BinaryType, col("id") -> LongType, lit(seed) -> LongType).as("html"))
      .withColumn("text", st.extract_text(col("html")))
      .withColumn("lang", st.lang_id(col("text")))
  }

  /** The deterministic gazetteer (entity -> lat/lon); small, broadcastable. */
  def gazetteer(spark: SparkSession): DataFrame = {
    val rows = (0 until PagesKernel.NumEntities).map { i =>
      (PagesKernel.entityName(i), PagesKernel.entityLat(i), PagesKernel.entityLon(i))
    }
    spark.createDataFrame(rows).toDF("entity", "lat", "lon")
  }

  /**
   * Geocode pages: extract the geo-entity mention from `text`, broadcast-join
   * the gazetteer, attach point geometry + S2 cell + tile ids. Pages without
   * a recognized entity drop out (inner join), mirroring a real geocoder's
   * hit set.
   */
  def geocode(pages: DataFrame, gazetteer: DataFrame,
              s2Level: Int = 9, zooms: Seq[Int] = Seq(4, 8, 12)): DataFrame = {
    val withEntity = pages.withColumn("entity",
      inv("extractEntity", StringType, col("text") -> StringType))
      .filter(col("entity").isNotNull)
    val geocoded = withEntity.join(broadcast(gazetteer), Seq("entity"), "inner")
      .withColumn("geometry", st.st_point(col("lon"), col("lat")))
      .withColumn("s2_cell", st.s2_cell(col("lat"), col("lon"), lit(s2Level)))
      .withColumn("h3_cell", st.h3_cell(col("lat"), col("lon"), lit(s2Level)))
    zooms.foldLeft(geocoded)((df, z) =>
      df.withColumn(s"tile_z$z", st.tile_id(col("lat"), col("lon"), lit(z))))
  }
}
