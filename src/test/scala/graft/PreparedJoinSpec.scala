package graft

import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Coordinate

import graft.functions.st
import graft.geom.Wkb
import graft.join.{SpatialJoin, SpatialPredicate}

/** Prepared-index reuse — the Spark counterpart of the reference's
 *  precomputed SpatialIndex handed in via SpatialJoinArgs
 *  (geopolars/src/spatial_index.rs:20-21; reuse test :558-624):
 *  prepare() once, join many, same rows, no covering recompute. */
class PreparedJoinSpec extends SparkSpec {

  private def boxWkb(minx: Double, miny: Double, maxx: Double, maxy: Double) =
    Wkb.write(Wkb.factory.createPolygon(Array(
      new Coordinate(minx, miny), new Coordinate(maxx, miny),
      new Coordinate(maxx, maxy), new Coordinate(minx, maxy),
      new Coordinate(minx, miny))))

  private def fixtures() = {
    import spark.implicits._
    val pts = (0 until 500).map { i =>
      (i.toLong, (i * 37 % 340 - 170) + 0.5, (i * 17 % 116 - 58) + 0.5)
    }.toDF("id", "lon", "lat")
      .select(col("id"), st.st_point(col("lon"), col("lat")).as("geometry"))
    val boxes = Seq(
      (1L, boxWkb(-170, -58, -30, 0)), (2L, boxWkb(-30, 0, 110, 58)),
      (3L, boxWkb(-170, 10, -100, 58)))
      .toDF("box_id", "geometry")
    (pts, boxes)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_left"), col("box_id_right"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("prepared join == fresh join, reused across two joins, plan is Generate-free") {
    val (pts, boxes) = fixtures()
    val fresh = SpatialJoin.join(pts, boxes, SpatialPredicate.Intersects,
      "inner", cellLevel = 4, leftPointsOnly = true)
    val prep = SpatialJoin.prepare(boxes, cellLevel = 4)
    try {
      assert(prep.coveringRows > boxes.count(), "multi-cell coverings expected")
      val first = SpatialJoin.join(pts, prep, SpatialPredicate.Intersects,
        "inner", "_left", broadcastRight = true, leftPointsOnly = true)
      val second = SpatialJoin.join(pts, prep, SpatialPredicate.Intersects,
        "inner", "_left", broadcastRight = true, leftPointsOnly = true)
      val expect = rows(fresh)
      assert(expect.nonEmpty)
      assert(rows(first) == expect)
      assert(rows(second) == expect)

      // the covering was computed at prepare() time: the join's executed plan
      // must read the materialized frame (InMemoryTableScan), never re-run
      // the per-polygon coverRect explode (Generate). The fresh path DOES
      // carry a Generate — asserting both proves the plans actually differ.
      val preparedPlan = second.queryExecution.executedPlan.toString
      // the plan STRING still prints the cached relation's originating
      // lineage (the Generate under InMemoryRelation) — what matters is that
      // no Generate executes ABOVE the cache read: the executed operators
      // are everything before the first InMemoryRelation marker
      val cacheIdx = preparedPlan.indexOf("InMemoryRelation")
      assert(cacheIdx >= 0 && preparedPlan.contains("InMemoryTableScan"),
        s"prepared join did not read the materialized covering:\n$preparedPlan")
      assert(!preparedPlan.substring(0, cacheIdx).contains("Generate"),
        s"prepared join re-computed the covering:\n$preparedPlan")
      val freshPlan = fresh.queryExecution.executedPlan.toString
      assert(freshPlan.contains("Generate"))
    } finally prep.unpersist()
  }

  test("durable covering: prepareToTable + loadPrepared joins Generate-free") {
    val (pts, boxes) = fixtures()
    val path = java.nio.file.Files.createTempDirectory("prepared-cover").toString
    SpatialJoin.prepareToTable(boxes, path, cellLevel = 4)
    val prep = SpatialJoin.loadPrepared(spark, path, cellLevel = 4)
    val joined = SpatialJoin.join(pts, prep, SpatialPredicate.Intersects,
      "inner", "_left", broadcastRight = true, leftPointsOnly = true)
    val fresh = SpatialJoin.join(pts, boxes, SpatialPredicate.Intersects,
      "inner", cellLevel = 4, leftPointsOnly = true)
    assert(rows(joined) == rows(fresh) && rows(joined).nonEmpty)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"covering recomputed:\n$plan")
    // the covering is READ from the partitioned parquet table
    assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"))
  }

  test("prepared generic (non-point) path and left join also match fresh") {
    val (pts, boxes) = fixtures()
    val prep = SpatialJoin.prepare(boxes, cellLevel = 4)
    try {
      for (jt <- Seq("inner", "left")) {
        val fresh = SpatialJoin.join(pts, boxes, SpatialPredicate.Intersects,
          jt, cellLevel = 4)
        val prepared = SpatialJoin.join(pts, prep, SpatialPredicate.Intersects,
          jt, "_left", broadcastRight = true, leftPointsOnly = false)
        val f = fresh.select("id_left", "box_id_right").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
          .groupBy(identity).view.mapValues(_.length).toMap
        val p = prepared.select("id_left", "box_id_right").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
          .groupBy(identity).view.mapValues(_.length).toMap
        assert(p == f, s"join type $jt")
      }
    } finally prep.unpersist()
  }
}
