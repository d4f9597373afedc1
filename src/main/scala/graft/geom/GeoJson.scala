package graft.geom

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom._

/**
 * GeoJSON (RFC 7946) codec — the interchange format behind the reference's
 * `read_file` surface: pyogrio/OGR's `GeoJSON` and `GeoJSONSeq` drivers are
 * the most common vector sources `read_file` is pointed at
 * (reference: py-geopolars io/file.py:15-119 reads "OGR data source"s; the
 * OGR driver registry resolves `.json`/`.geojson`/`.geojsonl` to them).
 * Original implementation over JTS — only jts-core ships in this
 * environment, which has no GeoJSON IO.
 *
 * Coordinates are XY only (this engine's WKB contract; RFC 7946 §3.1.1
 * additional ordinates are dropped by `force_2d` upstream, io/file.py:57-59).
 * Emission uses shortest-round-trip Java double formatting with whole
 * numbers compacted (`3.0` -> `3`), so parse(emit(g)) is bit-exact.
 *
 * Scala-side entry points: [[write]]/[[read]] on JTS geometries;
 * [[asGeoJson]]/[[fromGeoJson]]/[[featureRow]] are the Catalyst
 * `StaticInvoke` kernels (see `graft.functions.st.st_asGeoJson` etc.).
 */
object GeoJson {

  // ======================= emit =======================

  /** Geometry -> GeoJSON geometry object text. LinearRing (a JTS-only type;
   *  GeoJSON has no ring object, RFC 7946 §3.1) emits as LineString. */
  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    emit(g, sb)
    sb.toString
  }

  private def emit(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("""{"type":"Point","coordinates":""")
      if (p.isEmpty) sb.append("[]") else coord(p.getCoordinate, sb)
      sb.append('}')
    case l: LineString => // includes LinearRing
      sb.append("""{"type":"LineString","coordinates":""")
      ring(l, sb); sb.append('}')
    case p: Polygon =>
      sb.append("""{"type":"Polygon","coordinates":""")
      polyCoords(p, sb); sb.append('}')
    case m: MultiPoint =>
      sb.append("""{"type":"MultiPoint","coordinates":[""")
      var i = 0
      while (i < m.getNumGeometries) {
        if (i > 0) sb.append(',')
        val p = m.getGeometryN(i).asInstanceOf[Point]
        if (p.isEmpty) sb.append("[]") else coord(p.getCoordinate, sb)
        i += 1
      }
      sb.append("]}")
    case m: MultiLineString =>
      sb.append("""{"type":"MultiLineString","coordinates":[""")
      var i = 0
      while (i < m.getNumGeometries) {
        if (i > 0) sb.append(',')
        ring(m.getGeometryN(i).asInstanceOf[LineString], sb)
        i += 1
      }
      sb.append("]}")
    case m: MultiPolygon =>
      sb.append("""{"type":"MultiPolygon","coordinates":[""")
      var i = 0
      while (i < m.getNumGeometries) {
        if (i > 0) sb.append(',')
        polyCoords(m.getGeometryN(i).asInstanceOf[Polygon], sb)
        i += 1
      }
      sb.append("]}")
    case c: GeometryCollection =>
      sb.append("""{"type":"GeometryCollection","geometries":[""")
      var i = 0
      while (i < c.getNumGeometries) {
        if (i > 0) sb.append(',')
        emit(c.getGeometryN(i), sb)
        i += 1
      }
      sb.append("]}")
    case other =>
      throw new IllegalArgumentException(s"GeoJSON: unsupported geometry ${other.getGeometryType}")
  }

  private def polyCoords(p: Polygon, sb: java.lang.StringBuilder): Unit = {
    if (p.isEmpty) { sb.append("[]"); return }
    sb.append('[')
    ring(p.getExteriorRing, sb)
    var i = 0
    while (i < p.getNumInteriorRing) {
      sb.append(',')
      ring(p.getInteriorRingN(i), sb)
      i += 1
    }
    sb.append(']')
  }

  private def ring(l: LineString, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    val cs = l.getCoordinateSequence
    var i = 0
    while (i < cs.size()) {
      if (i > 0) sb.append(',')
      sb.append('[')
      num(cs.getX(i), sb); sb.append(',')
      num(cs.getY(i), sb)
      sb.append(']')
      i += 1
    }
    sb.append(']')
  }

  private def coord(c: Coordinate, sb: java.lang.StringBuilder): Unit = {
    sb.append('['); num(c.x, sb); sb.append(','); num(c.y, sb); sb.append(']')
  }

  /** Whole doubles compact to integer text (the form every other GeoJSON
   *  writer emits); everything else keeps Java's shortest round-trip repr.
   *  Negative zero is excluded from the compaction (r5 advice): -0.0.toLong
   *  is 0, which would drop the sign bit and break the documented bit-exact
   *  parse(emit(g)) round-trip for signed-zero coordinates. */
  private def num(d: Double, sb: java.lang.StringBuilder): Unit =
    if (d == math.rint(d) && math.abs(d) < 1e15 &&
      java.lang.Double.doubleToRawLongBits(d) != 0x8000000000000000L) sb.append(d.toLong)
    else sb.append(d)

  // ======================= parse =======================

  /** GeoJSON text -> JTS geometry. Accepts a geometry object, a Feature
   *  (unwraps its `geometry` member), or bare coordinates under any of the
   *  seven RFC 7946 §3.1 types. Additional per-position ordinates (Z) beyond
   *  XY are ignored. Fail-fast on malformed input (engine policy: corruption
   *  surfaces at ingest, not as silent NULLs mid-pipeline). */
  def read(json: String): Geometry =
    fromValue(ProjString.Json.parse(json))

  private def fromValue(v: Any): Geometry = v match {
    case m: Map[String @unchecked, Any @unchecked] =>
      m.get("type") match {
        case Some("Feature") =>
          m.get("geometry") match {
            case Some(g: Map[String @unchecked, Any @unchecked]) => fromValue(g)
            case Some(null) | None => Wkb.factory.createGeometryCollection()
            case other => throw new IllegalArgumentException(s"bad Feature geometry: $other")
          }
        case Some("GeometryCollection") =>
          val gs = list(m.getOrElse("geometries", Nil)).map(fromValue)
          Wkb.factory.createGeometryCollection(gs.toArray)
        case Some(t: String) => geometry(t, m.getOrElse("coordinates", Nil))
        case other => throw new IllegalArgumentException(s"GeoJSON object without type: $other")
      }
    case other => throw new IllegalArgumentException(s"not a GeoJSON object: $other")
  }

  private def geometry(tpe: String, coords: Any): Geometry = tpe match {
    case "Point" =>
      val c = list(coords)
      if (c.isEmpty) Wkb.factory.createPoint()
      else Wkb.factory.createPoint(position(c))
    case "LineString" =>
      Wkb.factory.createLineString(positions(coords))
    case "Polygon" => polygon(coords)
    case "MultiPoint" =>
      Wkb.factory.createMultiPointFromCoords(positions(coords))
    case "MultiLineString" =>
      Wkb.factory.createMultiLineString(
        list(coords).map(r => Wkb.factory.createLineString(positions(r))).toArray)
    case "MultiPolygon" =>
      Wkb.factory.createMultiPolygon(list(coords).map(polygon).toArray)
    case other => throw new IllegalArgumentException(s"unsupported GeoJSON type '$other'")
  }

  private def polygon(coords: Any): Polygon = {
    val rings = list(coords)
    if (rings.isEmpty) return Wkb.factory.createPolygon()
    val shell = Wkb.factory.createLinearRing(positions(rings.head))
    val holes = rings.tail.map(r => Wkb.factory.createLinearRing(positions(r))).toArray
    Wkb.factory.createPolygon(shell, holes)
  }

  private def list(v: Any): List[Any] = v match {
    case l: List[_] => l
    case other => throw new IllegalArgumentException(s"expected JSON array, got $other")
  }

  private def positions(v: Any): Array[Coordinate] =
    list(v).map(p => position(list(p))).toArray

  private def position(c: List[Any]): Coordinate = {
    // RFC 7946 §3.1.1: [lon, lat, (alt)] — extra ordinates ignored (XY engine)
    if (c.length < 2) throw new IllegalArgumentException(s"position needs >=2 numbers: $c")
    new Coordinate(dbl(c(0)), dbl(c(1)))
  }

  private def dbl(v: Any): Double = v match {
    case d: Double => d
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }

  // ======================= Catalyst kernels =======================

  /** st_asgeojson(wkb): geometry-object JSON text. */
  def asGeoJson(wkb: Array[Byte]): UTF8String =
    UTF8String.fromString(write(Wkb.read(wkb)))

  /** st_geomfromgeojson(text): WKB (canonical XY little-endian). */
  def fromGeoJson(s: UTF8String): Array[Byte] =
    Wkb.write(read(s.toString))

  /** One GeoJSONSeq line -> struct(geometry WKB | null, properties JSON text,
   *  id text | null). Accepts RFC 8142 record-separator (0x1E) prefixes and
   *  a bare geometry object (no Feature wrapper); a Feature with null
   *  geometry yields null WKB (the reference keeps such rows as plain
   *  attribute rows, io/file.py:112-119). */
  def featureRow(lineRaw: UTF8String): InternalRow = {
    var line = lineRaw.toString
    var s = 0
    while (s < line.length && (line.charAt(s) == '\u001E' || line.charAt(s).isWhitespace)) s += 1
    line = line.substring(s)
    val v = ProjString.Json.parse(line)
    val m = v match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(s"not a GeoJSON object: $other")
    }
    featureStruct(m)
  }

  /** Shared featureRow/featureCollectionRows body: one parsed Feature (or
   *  bare geometry) object -> struct(geometry, properties, id). */
  private def featureStruct(m: Map[String, Any]): InternalRow = {
    val (geomV, props, id) = m.get("type") match {
      case Some("Feature") =>
        (m.getOrElse("geometry", null),
          m.getOrElse("properties", null),
          m.get("id").map {
            case s: String => s
            case d: Double => if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
              else d.toString
            case o => String.valueOf(o)
          }.orNull)
      case Some(_) => (m, null, null) // bare geometry line
      case None => throw new IllegalArgumentException("GeoJSON object without type")
    }
    val wkb = geomV match {
      case null => null
      case g: Map[String @unchecked, Any @unchecked] => Wkb.write(fromValue(g))
      case other => throw new IllegalArgumentException(s"bad geometry member: $other")
    }
    val propsJson = props match {
      case null => "{}"
      case p => jsonText(p)
    }
    new GenericInternalRow(Array[Any](wkb, UTF8String.fromString(propsJson),
      if (id == null) null else UTF8String.fromString(id)))
  }

  /** Ingest-boundary quarantine predicate for GeoJSONSeq lines — the text
   *  analogue of `st_is_valid_wkb`: does the line parse as a feature this
   *  engine accepts? The parse kernels themselves stay FAIL-FAST (corruption
   *  must not silently become NULLs mid-pipeline); filter or flag bad lines
   *  ONCE at the edge of a crawl-scale corpus, then run the fail-fast
   *  kernels on what survives. Pure-JVM parse — no VM-error exposure, so
   *  NonFatal is the complete net here. */
  def geoJsonValid(line: UTF8String): Boolean =
    try { featureRow(line); true }
    catch { case scala.util.control.NonFatal(_) => false }

  /** Whole GeoJSON document -> array of feature structs (same shape as
   *  [[featureRow]]). Accepts a FeatureCollection (RFC 7946 §3.3), a single
   *  Feature, or a bare geometry object. */
  def featureCollectionRows(doc: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val v = ProjString.Json.parse(doc.toString)
    val features: List[Any] = v match {
      case m: Map[String @unchecked, Any @unchecked] if m.get("type").contains("FeatureCollection") =>
        list(m.getOrElse("features", Nil))
      case m: Map[_, _] => List(m)
      case other => throw new IllegalArgumentException(s"not a GeoJSON document: $other")
    }
    val rows: Array[Any] = features.map {
      case f: Map[String @unchecked, Any @unchecked] => featureStruct(f): Any
      case other => throw new IllegalArgumentException(s"bad feature entry: $other")
    }.toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Re-serialize a parsed JSON value (the Json parser's shapes). */
  private def jsonText(v: Any): String = {
    val sb = new java.lang.StringBuilder(64)
    jsonText(v, sb)
    sb.toString
  }

  private def jsonText(v: Any, sb: java.lang.StringBuilder): Unit = v match {
    case null => sb.append("null")
    case s: String =>
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    case b: Boolean => sb.append(b)
    case d: Double => num(d, sb)
    case l: List[_] =>
      sb.append('[')
      var first = true
      l.foreach { x => if (!first) sb.append(','); first = false; jsonText(x, sb) }
      sb.append(']')
    case m: Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, x) =>
        if (!first) sb.append(','); first = false
        jsonText(k.asInstanceOf[String], sb); sb.append(':'); jsonText(x, sb)
      }
      sb.append('}')
    case other => throw new IllegalArgumentException(s"unexpected JSON node $other")
  }
}
