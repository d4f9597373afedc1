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
   * `read_file`-shaped entry point (reference: py-geopolars io/file.py:15-107)
   * with every selective parameter mapped to a Catalyst pushdown:
   *
   *   columns       -> select: column pruning reaches the parquet ReadSchema
   *   where         -> filter(expr): predicate pushdown (PushedFilters)
   *   bbox          -> coarse-cell partition pruning (readBbox); like the
   *                    reference's OGR fallback path, the bbox result is a
   *                    covering SUPERSET (bounding-box grain) — combine with
   *                    `where` for exact geometric bounds
   *   maxFeatures   -> limit (clamped to Int.MaxValue: limit(n) past the row
   *                    count is a no-op, so the clamp preserves semantics for
   *                    any Long request instead of wrapping negative)
   *   fids          -> IN-list filter on the table's feature-id column
   *                    (pushed to the scan). OGR FIDs are driver-specific
   *                    (file.py:83-87: "starting index is driver and file
   *                    specific"); this engine's driver-specific FID is an
   *                    explicit long column, named by `fidCol`. Like the
   *                    reference, fids cannot combine with where/bbox/
   *                    maxFeatures (file.py:80-82).
   *   sql           -> full Spark SQL over the table registered as a temp
   *                    view named `sqlView` (file.py:104 `sql=`). The only
   *                    accepted `sql_dialect` is "spark" — OGRSQL/SQLITE are
   *                    OGR-engine dialects with no distributed counterpart,
   *                    and silently mis-parsing them would be worse than
   *                    refusing. As in the reference, `sql` replaces
   *                    columns/where/bbox/fids selection. NOTE the temp view
   *                    is SESSION-global (createOrReplaceTempView): two
   *                    concurrent sql= readers in one session must pass
   *                    distinct `sqlView` names, or the later registration
   *                    wins for both lazy plans.
   *   returnFids    -> appends the FID column as `fid` (file.py:88-89) even
   *                    when `columns` did not list it.
   *   readGeometry  -> false drops the geometry column (file.py:54-56
   *                    "If False, geometry will be None"); the pruned
   *                    ReadSchema then never touches the WKB bytes.
   *   force2d       -> re-encodes the geometry column as XY-only WKB
   *                    (file.py:57-59 "Z values ... ignored and 2D
   *                    geometries returned") via `st_force2d`, inside
   *                    codegen on the scan's own projection.
   *
   *   format        -> source routing, the "any OGR path" axis of
   *                    read_file: `parquet` (default; bbox = partition
   *                    pruning), `geojsonseq` / `geojson` (the GeoJSON
   *                    drivers below), `shapefile` ([[Shapefile.read]],
   *                    which carries a native 0-based `fid` column — the
   *                    fids/returnFids params compose with it directly).
   *                    Non-parquet sources have no partition structure, so
   *                    their bbox is the exact bbox-intersects predicate
   *                    (io/file.py:73-78's GEOS-absent contract).
   *
   *   layer         -> shapefile-directory layer selection by basename
   *                    (io/file.py:40-44; OGR's one-layer-per-.shp model).
   *                    Parquet/GeoJSON relations have exactly one layer, so
   *                    the param is shapefile-only here.
   *
   *   skipFeatures  -> sequential offset (io/file.py:58-61), shapefile-only:
   *                    a shapefile HAS a physical record order, so the skip
   *                    pushes into .shx range slicing (skipped records are
   *                    never read). A distributed parquet/GeoJSON table has
   *                    no such order, and combining with where/bbox/fids
   *                    would change what the offset counts — both refused.
   *
   * `encoding` is absent: every source here is UTF-8 (dbf: ISO-8859-1) by
   * construction.
   */
  def readFile(spark: SparkSession, path: String,
               columns: Seq[String] = Nil,
               where: Option[String] = None,
               bbox: Option[(Double, Double, Double, Double)] = None,
               maxFeatures: Option[Long] = None,
               partLevel: Int = 4,
               fids: Option[Seq[Long]] = None,
               sql: Option[String] = None,
               sqlDialect: String = "spark",
               sqlView: String = "read_file",
               fidCol: String = "fid",
               returnFids: Boolean = false,
               readGeometry: Boolean = true,
               force2d: Boolean = false,
               format: String = "parquet",
               layer: Option[String] = None,
               skipFeatures: Long = 0L,
               geometryCol: String = "geometry"): DataFrame = {
    require(layer.isEmpty || format == "shapefile",
      "layer selects a shapefile basename in a directory datasource " +
        "(parquet/GeoJSON relations have exactly one layer)")
    // skip_features needs the source's physical record order — real for a
    // shapefile (where it pushes into .shx range slicing), meaningless for
    // a distributed table. Selection params would change which features the
    // offset counts (pyogrio applies them first), so the combination is
    // refused rather than silently misordered.
    require(skipFeatures == 0L || (format == "shapefile" && where.isEmpty &&
      bbox.isEmpty && fids.isEmpty && sql.isEmpty),
      "skipFeatures requires format=shapefile and no where/bbox/fids/sql")
    def applyForce2d(df: DataFrame): DataFrame =
      if (force2d && readGeometry && df.columns.contains(geometryCol))
        df.withColumn(geometryCol, graft.functions.st.st_force2d(col(geometryCol)))
      else df
    require(sqlDialect == "spark",
      s"sql_dialect '$sqlDialect' not supported: this engine executes Spark SQL only")
    require(fids.isEmpty || (where.isEmpty && bbox.isEmpty && maxFeatures.isEmpty),
      "fids cannot be combined with where/bbox/maxFeatures (read_file contract)")
    require(sql.isEmpty || (columns.isEmpty && where.isEmpty && bbox.isEmpty && fids.isEmpty),
      "sql replaces columns/where/bbox/fids selection (read_file contract)")
    require(sql.isEmpty || !returnFids,
      "return_fids cannot combine with sql — select the fid column in the SQL instead")

    // source routing (read_file takes ANY OGR path; here: format param).
    // parquet's bbox is cell-PARTITION pruning (a covering superset); the
    // other drivers have no partition structure, so bbox refines to the
    // exact bbox-intersects predicate on the geometry itself — both honor
    // the reference's "geometries whose bounding boxes intersect" contract
    // (io/file.py:73-78).
    def source(withBbox: Boolean): DataFrame = {
      def bboxFilter(df: DataFrame): DataFrame = bbox match {
        case Some((minLat, minLon, maxLat, maxLon)) if withBbox =>
          df.filter(graft.functions.st.st_bboxIntersects(col(geometryCol),
            graft.functions.st.st_makeBox(lit(minLon), lit(minLat),
              lit(maxLon), lit(maxLat))))
        case _ => df
      }
      format match {
        case "parquet" => bbox match {
          case Some((minLat, minLon, maxLat, maxLon)) if withBbox =>
            readBbox(spark, path, minLat, minLon, maxLat, maxLon, partLevel)
          case _ => spark.read.parquet(path)
        }
        case "geojsonseq" => bboxFilter(readGeoJsonSeq(spark, path))
        case "geojson" => bboxFilter(readGeoJson(spark, path))
        case "shapefile" => bboxFilter(Shapefile.read(spark, path, layer = layer,
          skipFeatures = skipFeatures,
          maxFeatures = if (skipFeatures > 0) maxFeatures else None))
        case other => throw new IllegalArgumentException(
          s"read_file format '$other' not supported " +
            "(parquet | geojsonseq | geojson | shapefile)")
      }
    }

    sql match {
      case Some(q) =>
        source(withBbox = false).createOrReplaceTempView(sqlView)
        var out = spark.sql(q)
        if (!readGeometry) out = out.drop(geometryCol)
        out = applyForce2d(out)
        maxFeatures.foreach(n => out = out.limit(math.min(n, Int.MaxValue.toLong).toInt))
        out
      case None =>
        var df = source(withBbox = true)
        fids.foreach(ids => df = df.filter(col(fidCol).isin(ids: _*)))
        where.foreach(w => df = df.filter(expr(w)))
        if (columns.nonEmpty) {
          val cols = if (returnFids && !columns.contains(fidCol)) columns :+ fidCol else columns
          df = df.select(cols.map(col): _*)
        }
        if (returnFids) df = df.withColumn("fid", col(fidCol))
        if (!readGeometry) df = df.drop(geometryCol)
        df = applyForce2d(df)
        maxFeatures.foreach(n => df = df.limit(math.min(n, Int.MaxValue.toLong).toInt))
        df
    }
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

  // ======================= GeoJSON drivers =======================
  //
  // The reference's read_file is an OGR front-end (py-geopolars
  // io/file.py:15-119); OGR's two GeoJSON drivers map here as:
  //   GeoJSONSeq (.geojsonl, newline/RS-delimited features, RFC 8142) —
  //     the SCALE path: spark.read.text splits big files at line grain, the
  //     parse is a StaticInvoke inside codegen, the write is built from
  //     st_asgeojson + to_json so every part file writes executor-parallel.
  //   GeoJSON (one FeatureCollection document) — interchange-grain: one task
  //     per FILE (a single JSON document cannot split), for golden-data-size
  //     inputs; convert to GeoJSONSeq or parquet for bulk corpora.

  /**
   * Read newline-delimited GeoJSON features (OGR `GeoJSONSeq`). Columns:
   * `geometry` (canonical WKB, null for geometry-less features),
   * `properties` (the feature's properties object re-serialized as JSON
   * text — extract typed fields with `get_json_object`/`from_json`), `id`
   * (the optional RFC 7946 §3.2 feature id, as text). Accepts RFC 8142
   * record-separator prefixes and bare geometry-object lines.
   */
  def readGeoJsonSeq(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(graft.functions.st.geojson_feature(col("value")).as("f"))
      .select(col("f.geometry").as("geometry"),
        col("f.properties").as("properties"),
        col("f.id").as("id"))

  /**
   * Write a DataFrame with a WKB `geometry` column as newline-delimited
   * GeoJSON features under `dir` (one part file per partition,
   * executor-parallel). Every non-geometry column becomes a member of the
   * feature's `properties` object via Spark's native `to_json` (codegen;
   * nested structs/arrays/maps serialize as JSON naturally). Null geometries
   * emit `"geometry":null` features, mirroring the read path.
   */
  def writeGeoJsonSeq(df: DataFrame, dir: String,
                      geometryCol: String = "geometry"): Unit = {
    require(df.columns.contains(geometryCol),
      s"writeGeoJsonSeq needs a '$geometryCol' column")
    val props = df.columns.filterNot(_ == geometryCol)
    val propsJson =
      if (props.isEmpty) lit("{}")
      // to_json drops null fields by default; keep them as JSON nulls so the
      // round-trip preserves row shape (ignoreNullFields=false)
      else to_json(struct(props.map(col).toIndexedSeq: _*),
        Map("ignoreNullFields" -> "false"))
    val line = concat(
      lit("""{"type":"Feature","geometry":"""),
      when(col(geometryCol).isNull, lit("null"))
        .otherwise(graft.functions.st.st_asGeoJson(col(geometryCol))),
      lit(""","properties":"""), propsJson, lit("}"))
    df.select(line.as("value")).write.mode("overwrite").text(dir)
  }

  /**
   * Read GeoJSON FeatureCollection documents (OGR `GeoJSON` driver): every
   * file under `path` is ONE JSON document; parallelism is per file.
   * Same output schema as [[readGeoJsonSeq]].
   */
  def readGeoJson(spark: SparkSession, path: String): DataFrame = {
    // wholeText keeps each document intact; a FeatureCollection is a single
    // JSON value so it cannot split at line grain
    spark.read.option("wholetext", "true").text(path)
      .select(explode(graft.functions.st.geojson_collection(col("value"))).as("f"))
      .select(col("f.geometry").as("geometry"),
        col("f.properties").as("properties"),
        col("f.id").as("id"))
  }
}
