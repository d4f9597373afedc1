package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

import graft.geom.GeomKernel
import graft.index.IndexKernel
import graft.text.TextKernel

/**
 * `org.apache.spark.sql.functions`-style DSL for the spatial + text engine.
 *
 * Every function compiles to a `StaticInvoke` of a kernel method: inside
 * whole-stage codegen this is a direct static Java call (no UDF serialization,
 * no Row boxing), which keeps the geometry ops on the codegen hot path — the
 * Spark-native replacement for the reference's per-Series Rust kernels
 * (/root/reference/geopolars/geopolars-geo/src/geoseries.rs).
 */
object st {

  private def expr(c: Column): Expression = Bridge.expression(c)
  private def col(e: Expression): Column = Bridge.column(e)

  private def invoke(target: Class[_], name: String, dt: DataType,
                     returnNullable: Boolean, args: (Column, DataType)*): Column = {
    val cast = args.map { case (c, t) => expr(c.cast(t)) }
    val types = args.map(_._2)
    col(StaticInvoke(target, dt, name, cast, types,
      propagateNull = true, returnNullable = returnNullable))
  }

  private val G = GeomKernel.getClass
  private val I = IndexKernel.getClass
  private val T = TextKernel.getClass
  private val GJ = graft.geom.GeoJson.getClass

  private def geom1(name: String, dt: DataType, wkb: Column, nullable: Boolean = false) =
    invoke(G, name, dt, nullable, wkb -> BinaryType)

  // ---------- constructors ----------
  def st_point(x: Column, y: Column): Column =
    invoke(G, "stPoint", BinaryType, false, x -> DoubleType, y -> DoubleType)
  def st_makeBox(minx: Column, miny: Column, maxx: Column, maxy: Column): Column =
    invoke(G, "stMakeBox", BinaryType, false,
      minx -> DoubleType, miny -> DoubleType, maxx -> DoubleType, maxy -> DoubleType)
  def st_makeLine(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    invoke(G, "stMakeLine", BinaryType, false,
      x1 -> DoubleType, y1 -> DoubleType, x2 -> DoubleType, y2 -> DoubleType)
  def st_makeLine3(x1: Column, y1: Column, x2: Column, y2: Column,
                   x3: Column, y3: Column): Column =
    invoke(G, "stMakeLine3", BinaryType, false,
      x1 -> DoubleType, y1 -> DoubleType, x2 -> DoubleType, y2 -> DoubleType,
      x3 -> DoubleType, y3 -> DoubleType)
  def st_geomFromText(wkt: Column): Column =
    invoke(G, "stGeomFromText", BinaryType, false, wkt -> StringType)
  def st_asText(wkb: Column): Column = geom1("stAsText", StringType, wkb)

  /** GeoJSON geometry-object text of a WKB geometry (RFC 7946; OGR
   *  GeoJSON-driver parity for the reference's read_file surface). */
  def st_asGeoJson(wkb: Column): Column =
    invoke(GJ, "asGeoJson", StringType, false, wkb -> BinaryType)

  /** Parse GeoJSON text (geometry object or Feature) to canonical WKB. */
  def st_geomFromGeoJson(json: Column): Column =
    invoke(GJ, "fromGeoJson", BinaryType, false, json -> StringType)

  /** Schema of one parsed GeoJSONSeq feature line. */
  val geojsonFeatureSchema: StructType = StructType(Seq(
    StructField("geometry", BinaryType, nullable = true),
    StructField("properties", StringType, nullable = false),
    StructField("id", StringType, nullable = true)))

  /** Parse one GeoJSONSeq line -> struct(geometry, properties, id). */
  def geojson_feature(line: Column): Column =
    invoke(GJ, "featureRow", geojsonFeatureSchema, false, line -> StringType)

  /** Parse a whole GeoJSON FeatureCollection document -> array of feature
   *  structs (explode for rows). */
  def geojson_collection(doc: Column): Column =
    invoke(GJ, "featureCollectionRows", ArrayType(geojsonFeatureSchema, containsNull = false),
      false, doc -> StringType)

  /** Quarantine predicate: does the line parse as a GeoJSON feature?
   *  (the `st_is_valid_wkb` analogue for text ingest; the parse kernels
   *  stay fail-fast by design). */
  def geojson_valid(line: Column): Column =
    invoke(GJ, "geoJsonValid", BooleanType, false, line -> StringType)

  // ---------- accessors / measures ----------
  def st_area(wkb: Column): Column = geom1("stArea", DoubleType, wkb)
  def st_centroid(wkb: Column): Column = geom1("stCentroid", BinaryType, wkb)
  def st_convexHull(wkb: Column): Column = geom1("stConvexHull", BinaryType, wkb)
  def st_envelope(wkb: Column): Column = geom1("stEnvelope", BinaryType, wkb)
  val boundsSchema: StructType = StructType(Seq(
    StructField("minx", DoubleType, nullable = false),
    StructField("miny", DoubleType, nullable = false),
    StructField("maxx", DoubleType, nullable = false),
    StructField("maxy", DoubleType, nullable = false)))
  def st_bounds(wkb: Column): Column = geom1("stBounds", boundsSchema, wkb)
  def st_length(wkb: Column): Column = geom1("stLength", DoubleType, wkb)
  def st_geodesicLength(wkb: Column, method: String): Column =
    st_geodesicLength(wkb, lit(method))
  def st_geodesicLength(wkb: Column, method: Column): Column =
    invoke(G, "stGeodesicLength", DoubleType, false,
      wkb -> BinaryType, method -> StringType)
  def st_exterior(wkb: Column): Column = geom1("stExterior", BinaryType, wkb, nullable = true)
  def st_geomType(wkb: Column): Column = geom1("stGeomType", IntegerType, wkb)
  def st_isEmpty(wkb: Column): Column = geom1("stIsEmpty", BooleanType, wkb)

  /** Drop Z/M ordinates, re-encoding as canonical XY little-endian WKB
   *  (reference read_file's `force_2d`, io/file.py:57-59). */
  def st_force2d(wkb: Column): Column = geom1("stForce2d", BinaryType, wkb)
  /** Ingest-boundary quarantine predicate: do the bytes parse as WKB? The
   *  other kernels stay fail-fast on malformed input by design. */
  def st_is_valid_wkb(wkb: Column): Column = geom1("stIsValidWkb", BooleanType, wkb)
  def st_isRing(wkb: Column): Column = geom1("stIsRing", BooleanType, wkb)
  def st_x(wkb: Column): Column = geom1("stX", DoubleType, wkb, nullable = true)
  def st_y(wkb: Column): Column = geom1("stY", DoubleType, wkb, nullable = true)

  // ---------- binary ----------
  def st_distance(a: Column, b: Column): Column =
    invoke(G, "stDistance", DoubleType, false, a -> BinaryType, b -> BinaryType)
  def st_contains(a: Column, b: Column): Column =
    invoke(G, "stContains", BooleanType, false, a -> BinaryType, b -> BinaryType)
  def st_intersects(a: Column, b: Column): Column =
    invoke(G, "stIntersects", BooleanType, false, a -> BinaryType, b -> BinaryType)
  /** True when the planar distance between a and b is <= d (ST_DWithin). */
  def st_dwithin(a: Column, b: Column, d: Column): Column =
    st_distance(a, b) <= d
  def st_within(a: Column, b: Column): Column =
    invoke(G, "stWithin", BooleanType, false, a -> BinaryType, b -> BinaryType)
  def st_bboxIntersects(a: Column, b: Column): Column =
    invoke(G, "bboxIntersects", BooleanType, false, a -> BinaryType, b -> BinaryType)
  /** The reference's exact join-refinement truth table (spatial_index.rs:89-137). */
  def st_joinRefine(a: Column, b: Column, predicate: Column): Column =
    invoke(G, "joinRefine", BooleanType, false,
      a -> BinaryType, b -> BinaryType, predicate -> IntegerType)
  def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    invoke(G, "haversineDist", DoubleType, false,
      lat1 -> DoubleType, lon1 -> DoubleType, lat2 -> DoubleType, lon2 -> DoubleType)

  // ---------- affine ----------
  def st_affine(wkb: Column, a: Column, b: Column, d: Column, e: Column,
                xoff: Column, yoff: Column): Column =
    invoke(G, "stAffine", BinaryType, false, wkb -> BinaryType,
      a -> DoubleType, b -> DoubleType, d -> DoubleType, e -> DoubleType,
      xoff -> DoubleType, yoff -> DoubleType)
  def st_translate(wkb: Column, dx: Column, dy: Column): Column =
    invoke(G, "stTranslate", BinaryType, false,
      wkb -> BinaryType, dx -> DoubleType, dy -> DoubleType)
  def st_rotate(wkb: Column, angleDeg: Column, originMode: Column,
                ox: Column, oy: Column): Column =
    invoke(G, "stRotate", BinaryType, false, wkb -> BinaryType, angleDeg -> DoubleType,
      originMode -> IntegerType, ox -> DoubleType, oy -> DoubleType)
  def st_scale(wkb: Column, xf: Column, yf: Column, originMode: Column,
               ox: Column, oy: Column): Column =
    invoke(G, "stScale", BinaryType, false, wkb -> BinaryType, xf -> DoubleType,
      yf -> DoubleType, originMode -> IntegerType, ox -> DoubleType, oy -> DoubleType)
  def st_skew(wkb: Column, xs: Column, ys: Column, originMode: Column,
              ox: Column, oy: Column): Column =
    invoke(G, "stSkew", BinaryType, false, wkb -> BinaryType, xs -> DoubleType,
      ys -> DoubleType, originMode -> IntegerType, ox -> DoubleType, oy -> DoubleType)

  // ---------- set-theoretic overlay ----------
  def st_union(a: Column, b: Column): Column =
    invoke(G, "stUnion", BinaryType, false, a -> BinaryType, b -> BinaryType)
  def st_intersection(a: Column, b: Column): Column =
    invoke(G, "stIntersection", BinaryType, false, a -> BinaryType, b -> BinaryType)
  def st_difference(a: Column, b: Column): Column =
    invoke(G, "stDifference", BinaryType, false, a -> BinaryType, b -> BinaryType)
  def st_symDifference(a: Column, b: Column): Column =
    invoke(G, "stSymDifference", BinaryType, false, a -> BinaryType, b -> BinaryType)
  def st_buffer(wkb: Column, distance: Column): Column =
    invoke(G, "stBuffer", BinaryType, false, wkb -> BinaryType, distance -> DoubleType)
  /** Dissolve per group (TypedImperativeAggregate over JTS cascaded union). */
  def st_union_agg(geom: Column): Column = graft.expr.UnionAgg.st_union_agg(geom)

  /** Bounded per-group top-k (score, payload) pairs, best-first — the
   *  scale-safe kNN reducer (map-side combine; shuffle carries <= k rows per
   *  group per partition instead of the whole corpus through one window). */
  def topk_by(score: Column, payload: Column, k: Int, asc: Boolean = true): Column =
    graft.expr.TopKAgg.topk_by(score, payload, k, asc)

  // ---------- reshaping / CRS ----------
  def st_dump(wkb: Column): Column =
    invoke(G, "stDump", ArrayType(BinaryType, containsNull = false), false, wkb -> BinaryType)
  def st_simplify(wkb: Column, tolerance: Column): Column =
    invoke(G, "stSimplify", BinaryType, false, wkb -> BinaryType, tolerance -> DoubleType)
  def st_transform(wkb: Column, fromSrid: Column, toSrid: Column): Column =
    invoke(G, "stTransform", BinaryType, false,
      wkb -> BinaryType, fromSrid -> IntegerType, toSrid -> IntegerType)
  /** Reproject between CRS given as PROJ parameter strings ("+proj=tmerc
   *  +lat_0=... +ellps=GRS80") or authority form ("EPSG:nnnn"). */
  def st_transform(wkb: Column, fromCrs: String, toCrs: String): Column =
    st_transform_crs(wkb, lit(fromCrs), lit(toCrs))
  /** `to_crs_with_options` analogue (reference: geoseries.rs:259-266 +
   *  ops/proj.rs:15-18, whose only option redirects CRS resolution through
   *  extra search paths): here the options carry an extra NAMED-CRS registry
   *  — alias -> EPSG:nnnn / PROJ string / PROJJSON — resolved driver-side
   *  before the literal reaches the kernel (CRS args are literals, so
   *  resolution is a plan-time rewrite, not a per-row branch). */
  def st_transform(wkb: Column, fromCrs: String, toCrs: String,
                   options: graft.geom.ProjOptions): Column =
    st_transform_crs(wkb, lit(options.resolve(fromCrs)), lit(options.resolve(toCrs)))
  /** Column-typed CRS-string variant (SQL surface: st_transform_crs). */
  def st_transform_crs(wkb: Column, fromCrs: Column, toCrs: Column): Column =
    invoke(G, "stTransformProj", BinaryType, false,
      wkb -> BinaryType, fromCrs -> StringType, toCrs -> StringType)

  // ---------- spatial index ----------
  /** EPSG code of the WGS84 UTM zone containing a point. */
  def utm_srid(lat: Column, lon: Column): Column =
    invoke(G, "utmSrid", IntegerType, false, lat -> DoubleType, lon -> DoubleType)

  def s2_cell(lat: Column, lon: Column, level: Column): Column =
    invoke(I, "s2Cell", LongType, false,
      lat -> DoubleType, lon -> DoubleType, level -> IntegerType)
  def s2_parent(cell: Column, level: Column): Column =
    invoke(I, "s2Parent", LongType, false, cell -> LongType, level -> IntegerType)
  def h3_cell(lat: Column, lon: Column, res: Column): Column =
    invoke(I, "h3Cell", LongType, false,
      lat -> DoubleType, lon -> DoubleType, res -> IntegerType)
  /** Grid disk (k-ring) around a point: all cells within k hex steps of
   *  the containing cell — exactly 1 + 3k(k+1) ids. */
  def h3_disk(lat: Column, lon: Column, res: Column, k: Column): Column =
    invoke(I, "h3Disk", ArrayType(LongType, containsNull = false), false,
      lat -> DoubleType, lon -> DoubleType, res -> IntegerType, k -> IntegerType)

  def h3_parent(cell: Column, res: Column): Column =
    invoke(I, "h3Parent", LongType, false, cell -> LongType, res -> IntegerType)
  def tile_id(lat: Column, lon: Column, z: Column): Column =
    invoke(I, "tileId", LongType, false,
      lat -> DoubleType, lon -> DoubleType, z -> IntegerType)
  private val tileBoundsSchema = StructType(Seq(
    StructField("west", DoubleType, nullable = false),
    StructField("south", DoubleType, nullable = false),
    StructField("east", DoubleType, nullable = false),
    StructField("north", DoubleType, nullable = false)))

  /** Tile id -> lon/lat bounds (raster->vector, numeric form). */
  def tile_bounds(id: Column): Column =
    invoke(I, "tileBounds", tileBoundsSchema, false, id -> LongType)

  /** Tile id -> WKB box polygon (raster->vector, geometry form). */
  def tile_polygon(id: Column): Column =
    invoke(I, "tilePolygon", BinaryType, false, id -> LongType)

  def tile_x(lon: Column, z: Column): Column =
    invoke(I, "tileX", LongType, false, lon -> DoubleType, z -> IntegerType)
  def tile_y(lat: Column, z: Column): Column =
    invoke(I, "tileY", LongType, false, lat -> DoubleType, z -> IntegerType)
  def tile_zoom(id: Column): Column =
    invoke(I, "tileZoom", IntegerType, false, id -> LongType)
  def tile_parent(id: Column, z: Column): Column =
    invoke(I, "tileParent", LongType, false, id -> LongType, z -> IntegerType)

  // id introspection (debugging/partition design: which level is this key?)
  def s2_level(cell: Column): Column =
    invoke(I, "s2Level", IntegerType, false, cell -> LongType)
  def h3_res(cell: Column): Column =
    invoke(I, "h3Resolution", IntegerType, false, cell -> LongType)
  def h3_face(cell: Column): Column =
    invoke(I, "h3Face", IntegerType, false, cell -> LongType)

  // ---------- text / dedup / embeddings ----------
  def extract_text(html: Column): Column =
    invoke(T, "extractText", StringType, false, html -> BinaryType)
  def lang_id(text: Column): Column =
    invoke(T, "langId", StringType, false, text -> StringType)
  private val textStatsSchema = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_spaces", LongType, nullable = false),
    StructField("punct", LongType, nullable = false),
    StructField("uppers", LongType, nullable = false),
    StructField("digits", LongType, nullable = false)))

  /** Single-pass per-document counters (chars/spaces/punct/uppers/digits). */
  def text_stats(text: Column): Column =
    invoke(T, "textStats", textStatsSchema, false, text -> StringType)

  /** BPE-ish (GPT-2 pre-tokenizer classes) token count. */
  def token_count_bpe(text: Column): Column =
    invoke(T, "tokenCountBpe", LongType, false, text -> StringType)

  def fingerprint64(text: Column): Column =
    invoke(T, "fnv64", LongType, false, text -> StringType)
  def minhash_band(text: Column, k: Column, numHashes: Column, band: Column,
                   rowsPerBand: Column): Column =
    invoke(T, "minhashBand", LongType, false, text -> StringType, k -> IntegerType,
      numHashes -> IntegerType, band -> IntegerType, rowsPerBand -> IntegerType)
  /** All band keys in one signature pass; pair with posexplode. */
  def minhash_bands(text: Column, k: Column, numHashes: Column,
                    rowsPerBand: Column): Column =
    invoke(T, "minhashBands", ArrayType(LongType, containsNull = false), false,
      text -> StringType, k -> IntegerType, numHashes -> IntegerType,
      rowsPerBand -> IntegerType)
  def simhash64(text: Column, k: Column): Column =
    invoke(T, "simhash", LongType, false, text -> StringType, k -> IntegerType)
  def hamming64(a: Column, b: Column): Column =
    invoke(T, "hamming64", IntegerType, false, a -> LongType, b -> LongType)
  /** Winnowing document fingerprints (rolling k-gram hashes + window-min
   *  selection; any shared substring >= w+k-1 bytes shares a fingerprint). */
  def winnow_fingerprints(text: Column, k: Column, w: Column): Column =
    invoke(T, "winnow", ArrayType(LongType, containsNull = false), false,
      text -> StringType, k -> IntegerType, w -> IntegerType)

  def jaccard_shingles(a: Column, b: Column, k: Column): Column =
    invoke(T, "jaccardShingles", DoubleType, false,
      a -> StringType, b -> StringType, k -> IntegerType)
  def cosine_sim(a: Column, b: Column): Column =
    invoke(T, "cosineSim", DoubleType, false,
      a -> ArrayType(FloatType), b -> ArrayType(FloatType))
  def l2_norm(a: Column): Column =
    invoke(T, "l2Norm", DoubleType, false, a -> ArrayType(FloatType))
  def cosine_lsh_bucket(a: Column, nBits: Column): Column =
    invoke(T, "cosineLshBucket", LongType, false,
      a -> ArrayType(FloatType), nBits -> IntegerType)

  /** Query-side multi-probe bucket set (own bucket + Hamming<=maxHamming). */
  def cosine_lsh_probes(a: Column, nBits: Column, maxHamming: Column): Column =
    invoke(T, "cosineLshProbes", ArrayType(LongType, containsNull = false), false,
      a -> ArrayType(FloatType), nBits -> IntegerType, maxHamming -> IntegerType)

  // ---------- GeoArrow-style native nested encodings ----------
  private val GA = graft.geom.GeoArrow.getClass
  private val xyStruct = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
  private val lineType = ArrayType(xyStruct, containsNull = false)
  private val polyType = ArrayType(lineType, containsNull = false)

  /** WKB Point -> struct{x,y} (NULL for non-points). */
  def st_point_native(wkb: Column): Column =
    invoke(GA, "pointNative", xyStruct, true, wkb -> BinaryType)

  /** WKB LineString -> array<struct{x,y}> (NULL otherwise). */
  def st_line_native(wkb: Column): Column =
    invoke(GA, "lineNative", lineType, true, wkb -> BinaryType)

  /** WKB Polygon -> array<array<struct{x,y}>>, ring 0 = shell (NULL otherwise). */
  def st_polygon_native(wkb: Column): Column =
    invoke(GA, "polygonNative", polyType, true, wkb -> BinaryType)

  def st_from_point_native(p: Column): Column =
    invoke(GA, "pointFromNative", BinaryType, false, p -> xyStruct)

  def st_from_line_native(l: Column): Column =
    invoke(GA, "lineFromNative", BinaryType, false, l -> lineType)

  def st_from_polygon_native(p: Column): Column =
    invoke(GA, "polygonFromNative", BinaryType, false, p -> polyType)

  // Multi* native encodings — the reference READ path reconstructs all six
  // types incl. triple-nested MultiPolygon (geoseries.py:170-214); its write
  // path raises on Multi*, so these extend parity on the read side.
  private val multiPolyType = ArrayType(polyType, containsNull = false)
  // from-native INPUT types keep fields nullable: a caller-constructed
  // array(struct(...)) column has nullable fields, and Catalyst refuses to
  // cast nullable -> NOT NULL (values are still read as doubles either way)
  private val xyStructN = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType)))
  private val lineTypeN = ArrayType(xyStructN)
  private val polyTypeN = ArrayType(lineTypeN)
  private val multiPolyTypeN = ArrayType(polyTypeN)

  /** WKB MultiPoint -> array<struct{x,y}> (NULL otherwise). */
  def st_multipoint_native(wkb: Column): Column =
    invoke(GA, "multiPointNative", lineType, true, wkb -> BinaryType)

  /** WKB MultiLineString -> array<array<struct{x,y}>> (NULL otherwise). */
  def st_multiline_native(wkb: Column): Column =
    invoke(GA, "multiLineNative", polyType, true, wkb -> BinaryType)

  /** WKB MultiPolygon -> array<array<array<struct{x,y}>>> (NULL otherwise). */
  def st_multipolygon_native(wkb: Column): Column =
    invoke(GA, "multiPolygonNative", multiPolyType, true, wkb -> BinaryType)

  def st_from_multipoint_native(p: Column): Column =
    invoke(GA, "multiPointFromNative", BinaryType, false, p -> lineTypeN)

  def st_from_multiline_native(l: Column): Column =
    invoke(GA, "multiLineFromNative", BinaryType, false, l -> polyTypeN)

  def st_from_multipolygon_native(p: Column): Column =
    invoke(GA, "multiPolygonFromNative", BinaryType, false, p -> multiPolyTypeN)

  // ---------- multimodal: real JDK image codecs (PNG/BMP/GIF/JPEG) ----------
  private val M = graft.multimodal.ImageKernel.getClass
  private val imgStatsSchema = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Deterministic solid-colour PNG (test/gate image source). */
  def png_const(w: Column, h: Column, r: Column, g: Column, b: Column): Column =
    invoke(M, "pngConst", BinaryType, false, w -> IntegerType, h -> IntegerType,
      r -> IntegerType, g -> IntegerType, b -> IntegerType)

  /** Decode + per-channel stats; NULL for bytes no JDK reader accepts. */
  def img_stats(bytes: Column): Column =
    invoke(M, "imgStats", imgStatsSchema, true, bytes -> BinaryType)

  /** Nearest-neighbour resize re-encoded as PNG; NULL if undecodable. */
  def img_resize(bytes: Column, w: Column, h: Column): Column =
    invoke(M, "imgResize", BinaryType, true,
      bytes -> BinaryType, w -> IntegerType, h -> IntegerType)

  // ---------- multimodal: real JDK audio codec (WAV/AIFF PCM) ----------
  private val AU = graft.multimodal.AudioKernel.getClass
  private val audioStatsSchema = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("mean", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))

  /** Deterministic square-wave 16-bit PCM WAV (test/gate audio source). */
  def wav_square(sampleRate: Column, nSamples: Column, amp: Column): Column =
    invoke(AU, "wavSquare", BinaryType, false, sampleRate -> IntegerType,
      nSamples -> IntegerType, amp -> IntegerType)

  /** Decode WAV/AIFF PCM + sample stats; NULL for undecodable bytes. */
  def audio_stats(bytes: Column): Column =
    invoke(AU, "audioStats", audioStatsSchema, true, bytes -> BinaryType)

  // ---------- multimodal: real AVI/DIB video codec (pure JDK) ----------
  private val V = graft.multimodal.VideoKernel.getClass
  private val videoStatsSchema = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))
  private val frameStatsSchema = StructType(Seq(
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Deterministic solid-colour-gradient AVI clip (test/gate video source). */
  def avi_gradient(w: Column, h: Column, nFrames: Column, fps: Column,
                   r0: Column, g0: Column, b0: Column, step: Column): Column =
    invoke(V, "aviGradient", BinaryType, false, w -> IntegerType, h -> IntegerType,
      nFrames -> IntegerType, fps -> IntegerType, r0 -> IntegerType,
      g0 -> IntegerType, b0 -> IntegerType, step -> IntegerType)

  /** Decode AVI/DIB video: dims, frame count, fps, whole-clip channel means;
   *  NULL for undecodable bytes. */
  def video_stats(bytes: Column): Column =
    invoke(V, "videoStats", videoStatsSchema, true, bytes -> BinaryType)

  /** Frame-sample stats: channel means of one frame (0-based); NULL if
   *  undecodable or out of range. */
  def video_frame_stats(bytes: Column, frame: Column): Column =
    invoke(V, "videoFrameStats", frameStatsSchema, true,
      bytes -> BinaryType, frame -> IntegerType)

  /** Frame-sample to PNG (lossless) — composes with img_stats/img_resize. */
  def video_frame_png(bytes: Column, frame: Column): Column =
    invoke(V, "videoFramePng", BinaryType, true,
      bytes -> BinaryType, frame -> IntegerType)

  /** Deterministic Motion-JPEG AVI clip (test/gate video source, r5). */
  def avi_mjpeg(w: Column, h: Column, nFrames: Column, fps: Column,
                r0: Column, g0: Column, b0: Column, step: Column): Column =
    invoke(V, "aviMjpeg", BinaryType, false, w -> IntegerType, h -> IntegerType,
      nFrames -> IntegerType, fps -> IntegerType, r0 -> IntegerType,
      g0 -> IntegerType, b0 -> IntegerType, step -> IntegerType)

  /** Codec id of an AVI clip: 0 = uncompressed DIB, 1 = MJPEG; NULL if the
   *  bytes are not a well-formed AVI. */
  def video_codec(bytes: Column): Column =
    invoke(V, "videoCodec", IntegerType, true, bytes -> BinaryType)
}
