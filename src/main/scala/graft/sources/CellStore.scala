package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.S2

/**
 * Cell-partitioned storage layout: pages written partitioned by a coarse S2
 * parent cell, sorted within files by the fine cell. This is the distributed
 * replacement for the reference's manual `read_file(bbox=...)` pushdown
 * (py-geopolars io/file.py:73-78): a bbox query becomes partition pruning at
 * file granularity (the coarse-cell partition column) plus a parquet
 * min/max row-group skip on the sorted fine cell, both handled by Catalyst —
 * no custom reader code.
 *
 * At 100 TB this layout is what makes polygon-local queries cheap: a query
 * touching k coarse cells reads only those directories regardless of total
 * table size.
 */
object CellStore {

  /** Partition-column name for the coarse cell. */
  val PartCol = "cell_part"

  /**
   * Write `df` (must carry a fine `s2_cell` column) partitioned by the
   * level-`partLevel` parent cell and sorted by fine cell within partitions.
   */
  def write(df: DataFrame, path: String, partLevel: Int = 4): Unit = {
    df.withColumn(PartCol, graft.functions.st.s2_parent(col("s2_cell"), lit(partLevel)))
      .repartition(col(PartCol))
      .sortWithinPartitions("s2_cell")
      .write
      .mode("overwrite")
      .partitionBy(PartCol)
      .parquet(path)
  }

  /**
   * Read rows whose point can fall inside the given lat/lon bbox: computes
   * the coarse covering cells and filters on the partition column — Catalyst
   * turns this into partition pruning (only matching directories are listed),
   * then refines on the fine cell range.
   */
  def readBbox(spark: SparkSession, path: String,
               minLat: Double, minLon: Double, maxLat: Double, maxLon: Double,
               partLevel: Int = 4): DataFrame = {
    val parts = S2.coverRect(minLat, minLon, maxLat, maxLon, partLevel)
    spark.read.parquet(path)
      .filter(col(PartCol).isin(parts.toIndexedSeq: _*))
  }

  /**
   * `read_file`-shaped entry point (reference: py-geopolars io/file.py:15-90)
   * with every selective parameter mapped to a Catalyst pushdown:
   *
   *   columns       -> select: column pruning reaches the parquet ReadSchema
   *   where         -> filter(expr): predicate pushdown (PushedFilters)
   *   bbox          -> coarse-cell partition pruning (readBbox); like the
   *                    reference's OGR fallback path, the bbox result is a
   *                    covering SUPERSET (bounding-box grain) — combine with
   *                    `where` for exact geometric bounds
   *   maxFeatures   -> limit
   *
   * `skip_features` is deliberately absent: it assumes OGR's sequential
   * row order, which a distributed table does not have.
   */
  def readFile(spark: SparkSession, path: String,
               columns: Seq[String] = Nil,
               where: Option[String] = None,
               bbox: Option[(Double, Double, Double, Double)] = None,
               maxFeatures: Option[Long] = None,
               partLevel: Int = 4): DataFrame = {
    var df = bbox match {
      case Some((minLat, minLon, maxLat, maxLon)) =>
        readBbox(spark, path, minLat, minLon, maxLat, maxLon, partLevel)
      case None => spark.read.parquet(path)
    }
    where.foreach(w => df = df.filter(expr(w)))
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    maxFeatures.foreach(n => df = df.limit(n.toInt))
    df
  }

  /**
   * Bucketed catalog table on the fine cell: two tables bucketed the same
   * way join with NO exchange on either side — the co-located-join layout
   * for repeated large×large spatial joins at 100 TB (pay the shuffle once
   * at write time, never again per query). Buckets + sort on `s2_cell`; the
   * join key must be the bucket column.
   */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    nBuckets: Int = 64): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, "s2_cell")
      .sortBy("s2_cell")
      .option("path", s"$path/$table")
      .format("parquet")
      .saveAsTable(table)
}
