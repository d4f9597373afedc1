package graft.snapshot

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/**
 * Iceberg-style snapshot table layout in pure Scala (no Iceberg jar ships in
 * this environment — SURVEY.md §7.0): parquet data files + JSON manifest with
 * snapshot id, parent id, input fingerprint and per-partition lineage, plus a
 * metrics table of per-partition row counts and task latencies captured from
 * the actual write job via a SparkListener (no second pass over the data).
 *
 * Layout:
 *   <root>/data/snap-<id>/part-*.parquet        (the rows)
 *   <root>/metrics/snap-<id>/                   (partition_id, rows, millis)
 *   <root>/manifests/snap-<id>.json             (lineage manifest)
 *   <root>/CURRENT                              (latest committed snapshot id)
 *
 * Resumability contract (BASELINE.json:6,14): `runStage` recomputes only when
 * no committed snapshot carries the requested (stage, fingerprint); a rerun
 * of the same pipeline re-reads instead of recomputing, and commits are
 * manifest-last so a crashed write is simply retried.
 */
object Snapshot {

  final case class Manifest(snapshotId: Long, parentId: Long, stage: String,
                            fingerprint: String, rowCount: Long, files: Seq[String],
                            appId: String, committedAtMs: Long)

  private def q(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def manifestJson(m: Manifest): String = {
    s"""{"snapshot_id":${m.snapshotId},"parent_id":${m.parentId},"stage":${q(m.stage)},
       |"fingerprint":${q(m.fingerprint)},"row_count":${m.rowCount},
       |"files":[${m.files.map(q).mkString(",")}],
       |"app_id":${q(m.appId)},"committed_at_ms":${m.committedAtMs}}""".stripMargin.replace("\n", "")
  }

  private def parseField(json: String, key: String): String = {
    val p = ("\"" + key + "\":").r
    val m = p.findFirstMatchIn(json).getOrElse(sys.error(s"manifest missing $key"))
    val rest = json.substring(m.end).trim
    if (rest.startsWith("\"")) rest.drop(1).takeWhile(_ != '"')
    else rest.takeWhile(c => c != ',' && c != '}')
  }

  def currentId(root: String): Option[Long] = {
    val p = Paths.get(root, "CURRENT")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  def readManifest(root: String, id: Long): Manifest = {
    val json = new String(Files.readAllBytes(Paths.get(root, "manifests", s"snap-$id.json")),
      StandardCharsets.UTF_8)
    Manifest(
      parseField(json, "snapshot_id").toLong, parseField(json, "parent_id").toLong,
      parseField(json, "stage"), parseField(json, "fingerprint"),
      parseField(json, "row_count").toLong, Nil,
      parseField(json, "app_id"), parseField(json, "committed_at_ms").toLong)
  }

  /** Latest committed manifest matching (stage, fingerprint), walking the
   *  parent chain from CURRENT. */
  def find(root: String, stage: String, fingerprint: String): Option[Manifest] = {
    var cur = currentId(root)
    while (cur.isDefined && cur.get > 0) {
      val m = readManifest(root, cur.get)
      if (m.stage == stage && m.fingerprint == fingerprint) return Some(m)
      cur = Some(m.parentId)
    }
    None
  }

  def dataPath(root: String, id: Long): String = s"$root/data/snap-$id"

  /** Write `df` as a new snapshot; returns the committed manifest. */
  def write(df: DataFrame, root: String, stage: String, fingerprint: String): Manifest = {
    val spark = df.sparkSession
    val parent = currentId(root).getOrElse(0L)
    val id = parent + 1
    val dataDir = dataPath(root, id)

    val (rows, metrics) = withTaskMetrics(spark) {
      df.write.mode("overwrite").parquet(dataDir)
    }

    // metrics table: per-partition lineage (task index = output partition)
    val metricsDf = spark.createDataFrame(metrics.map(m =>
      (id, m.taskIndex, m.records, m.millis)))
      .toDF("snapshot_id", "partition_id", "rows_written", "task_millis")
    metricsDf.coalesce(1).write.mode("overwrite").parquet(s"$root/metrics/snap-$id")

    val files = Files.list(Paths.get(dataDir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted.toSeq
    val manifest = Manifest(id, parent, stage, fingerprint,
      metrics.map(_.records).sum, files,
      spark.sparkContext.applicationId, System.currentTimeMillis())

    Files.createDirectories(Paths.get(root, "manifests"))
    Files.write(Paths.get(root, "manifests", s"snap-$id.json"),
      manifestJson(manifest).getBytes(StandardCharsets.UTF_8))
    // manifest-last commit: CURRENT flips only after data+manifest are durable
    val tmp = Paths.get(root, "CURRENT.tmp")
    Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, "CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val _ = rows
    manifest
  }

  def read(spark: SparkSession, root: String, id: Long): DataFrame =
    spark.read.parquet(dataPath(root, id))

  /** Time travel: read the snapshot that was CURRENT at or before `tsMs`. */
  def readAsOf(spark: SparkSession, root: String, tsMs: Long): DataFrame = {
    var cur = currentId(root)
    while (cur.isDefined && cur.get > 0) {
      val m = readManifest(root, cur.get)
      if (m.committedAtMs <= tsMs) return read(spark, root, m.snapshotId)
      cur = Some(m.parentId)
    }
    throw new IllegalArgumentException(s"no snapshot at or before $tsMs in $root")
  }

  /** Roll CURRENT back to an earlier snapshot (data files are immutable, so
   *  this is just a pointer flip; later snapshots stay readable by id). */
  def rollback(root: String, id: Long): Unit = {
    readManifest(root, id) // validates existence
    val tmp = Paths.get(root, "CURRENT.tmp")
    Files.write(tmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, "CURRENT"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The manifest chain from CURRENT back to the first snapshot (lineage). */
  def history(root: String): Seq[Manifest] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Manifest]
    var cur = currentId(root)
    while (cur.isDefined && cur.get > 0) {
      val m = readManifest(root, cur.get)
      out += m
      cur = Some(m.parentId)
    }
    out.toSeq
  }

  /**
   * Checkpoint-or-compute: if a committed snapshot exists for this
   * (stage, fingerprint), read it back (resume path); otherwise compute,
   * snapshot, and read back from the snapshot so downstream stages consume
   * exactly the committed bytes.
   */
  def runStage(spark: SparkSession, root: String, stage: String, fingerprint: String)
              (compute: => DataFrame): DataFrame = {
    find(root, stage, fingerprint) match {
      case Some(m) => read(spark, root, m.snapshotId)
      case None =>
        val m = write(compute, root, stage, fingerprint)
        read(spark, root, m.snapshotId)
    }
  }

  final case class TaskMetric(taskIndex: Int, records: Long, millis: Long)

  /** Capture per-task output metrics of the job(s) run inside `body`.
   *  Only successful task attempts count, and one metric is kept per
   *  (stage, partition index) — otherwise failed or speculative attempts
   *  would inflate row_count and duplicate partition rows in the metrics
   *  table. Keyed by stage too so a multi-stage write doesn't collapse
   *  distinct stages' partition 0s into one. */
  def withTaskMetrics[T](spark: SparkSession)(body: => T): (T, Seq[TaskMetric]) = {
    val byTask = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), TaskMetric]
    val ownStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      // scope to jobs submitted while the listener is live (not a pre-existing
      // concurrent job's stages); jobs another thread submits concurrently
      // inside `body` are indistinguishable and still counted
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        j.stageInfos.foreach(si => ownStages.add(si.stageId))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.reason == org.apache.spark.Success && ownStages.contains(t.stageId) &&
          t.taskMetrics != null && t.taskMetrics.outputMetrics != null &&
          t.taskMetrics.outputMetrics.recordsWritten > 0) {
          byTask.synchronized {
            // last successful attempt wins (a speculative duplicate of a
            // successful task writes the same committed output once)
            byTask((t.stageId, t.taskInfo.index)) =
              TaskMetric(t.taskInfo.index, t.taskMetrics.outputMetrics.recordsWritten,
                t.taskInfo.duration)
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      // listener bus is async; drain before reading
      org.apache.spark.graftbridge.SparkBridge.drainListenerBus(spark.sparkContext)
      (r, byTask.synchronized(byTask.values.toSeq))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
