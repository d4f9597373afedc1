package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward as-of join — for each left row, the latest right row with
 * `right.ts <= left.ts` for the same key (DuckDB/kdb ASOF semantics: ties on
 * equal timestamps match). The reference is batch-relational and has no
 * time-series join; this is the companion the brief's custom-operator list
 * names alongside the range join.
 *
 * Scale shape: both sides union into one frame tagged by origin, ONE shuffle
 * partitioned by key, sort within partitions by (ts, origin), and the right
 * payload carries forward with `last(ignoreNulls)` over the growing window.
 * No per-key loops, no range-condition join explosion: at any corpus size the
 * cost is a single exchange + sort, the plan Spark gives a groupBy of the
 * same key. Skewed keys ride AQE like any other key-partitioned sort.
 *
 * Contract: `right` must have at most one row per (key, ts) — with
 * duplicates the carried row among equal timestamps is tie-order dependent.
 * `valueCols` must not collide with left column names.
 */
object AsofJoin {

  def join(left: DataFrame, right: DataFrame,
           keyCol: String, tsCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asof join needs at least one right value column")
    val clash = valueCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asof value columns collide with left columns: $clash")

    val l = left.withColumn("__r", lit(0))
    val r = right.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__r")) ++ valueCols.map(col)): _*)
    // union fills each side's missing columns with NULL
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts (__r desc), so an exact
    // timestamp tie matches — the ASOF >= convention
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__r") === 0).drop("__r")
  }
}
