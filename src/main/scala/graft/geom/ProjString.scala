package graft.geom

import java.util.concurrent.ConcurrentHashMap

/**
 * PROJ parameter-string CRS support — the generality of the reference's only
 * live reprojection path (geopolars/geopolars-geo/src/ops/proj.rs:33-70
 * accepts arbitrary PROJ authority strings). PROJ itself does not ship
 * offline, so the parameters are parsed here and routed to this repo's own
 * projection kernels:
 *
 *   +proj=tmerc    Krüger-series Transverse Mercator (with +lat_0 offset)
 *   +proj=merc     ellipsoidal Mercator (spherical when the ellipsoid is)
 *   +proj=laea     Snyder oblique/equatorial LAEA incl. the D factor
 *   +proj=longlat  identity (degrees)
 *   EPSG:nnnn      authority form, routed to the numeric dispatch
 *
 * Recognized parameters: +ellps (WGS84 | GRS80 | intl | bessel | sphere),
 * +a +b +rf +f +R overrides, +lat_0 +lon_0 +k/+k_0 +x_0 +y_0, and the
 * no-op tail every PROJ string carries (+units=m, +no_defs, +type=crs,
 * +datum=WGS84, all-zero +towgs84). Anything else throws — a CRS must never
 * be silently misinterpreted.
 */
object ProjString {

  final case class Spec(proj: String, ell: Proj.Ellipsoid,
                        lat0: Double, lon0: Double, k0: Double,
                        x0: Double, y0: Double, srid: Int,
                        /** rectifying-northing of lat_0 (tmerc origin shift) */
                        tmRefY: Double)

  // parse results are tiny and the distinct strings per job are few (they
  // arrive as column literals); cap the cache against adversarial cardinality
  private val cache = new ConcurrentHashMap[String, Spec]()
  private val MaxCache = 4096

  def parse(s: String): Spec = {
    val hit = cache.get(s)
    if (hit != null) return hit
    val spec = doParse(s)
    if (cache.size < MaxCache) cache.putIfAbsent(s, spec)
    spec
  }

  private val knownEllipsoids = Map(
    "WGS84" -> Proj.Wgs84,
    "GRS80" -> Proj.Grs80,
    "intl" -> Proj.Ellipsoid(6378388.0, 1.0 / 297.0),
    "bessel" -> Proj.Ellipsoid(6377397.155, 1.0 / 299.1528128),
    "sphere" -> Proj.Ellipsoid(6371000.0, 0.0))

  private def fail(s: String, why: String): Nothing =
    throw new IllegalArgumentException(s"to_crs: unsupported PROJ string '$s' ($why)")

  private def doParse(raw: String): Spec = {
    val s = raw.trim
    if (s.toLowerCase.startsWith("epsg:")) {
      val srid = try s.substring(5).trim.toInt catch {
        case _: NumberFormatException => fail(s, "bad EPSG code")
      }
      if (!Proj.isSupported(srid)) Proj.toLonLat(srid, 0, 0) // throws with the srid list
      return Spec("epsg", Proj.Wgs84, 0, 0, 1, 0, 0, srid, 0)
    }
    if (!s.startsWith("+")) fail(s, "expected +proj=... or EPSG:nnnn")
    var kv = Map.empty[String, String]
    s.split("\\s+").withFilter(_.nonEmpty).foreach { tok =>
      if (!tok.startsWith("+")) fail(s, s"token '$tok' does not start with +")
      val t = tok.drop(1)
      val i = t.indexOf('=')
      kv += (if (i < 0) (t, "") else (t.take(i), t.drop(i + 1)))
    }
    val known = Set("proj", "ellps", "datum", "a", "b", "rf", "f", "R",
      "lat_0", "lon_0", "k", "k_0", "x_0", "y_0", "units", "no_defs",
      "towgs84", "type")
    kv.keys.find(!known.contains(_)).foreach(k => fail(s, s"unknown parameter +$k"))
    kv.get("units").filter(_ != "m").foreach(u => fail(s, s"unsupported units $u"))
    kv.get("datum").filter(_ != "WGS84").foreach(d => fail(s, s"unsupported datum $d"))
    kv.get("towgs84").filter(_.split(",").exists(v => v.trim.toDouble != 0.0))
      .foreach(_ => fail(s, "datum shifts (+towgs84) not supported"))

    def num(key: String, default: Double): Double =
      kv.get(key).map(v => try v.toDouble catch {
        case _: NumberFormatException => fail(s, s"bad number for +$key")
      }).getOrElse(default)

    val proj = kv.getOrElse("proj", fail(s, "missing +proj"))
    // ellipsoid: named base, then explicit overrides
    var ell = kv.get("ellps") match {
      case Some(name) => knownEllipsoids.getOrElse(name, fail(s, s"unknown ellps $name"))
      case None => if (kv.contains("R")) knownEllipsoids("sphere") else Proj.Wgs84
    }
    if (kv.contains("R")) ell = Proj.Ellipsoid(num("R", ell.a), 0.0)
    if (kv.contains("a")) {
      val a = num("a", ell.a)
      val f =
        if (kv.contains("rf")) 1.0 / num("rf", 0)
        else if (kv.contains("f")) num("f", 0)
        else if (kv.contains("b")) (a - num("b", a)) / a
        else ell.f
      ell = Proj.Ellipsoid(a, f)
    } else if (kv.contains("rf")) ell = Proj.Ellipsoid(ell.a, 1.0 / num("rf", 0))
    else if (kv.contains("f")) ell = Proj.Ellipsoid(ell.a, num("f", 0))

    val lat0 = num("lat_0", 0.0)
    val lon0 = num("lon_0", 0.0)
    val k0 = if (kv.contains("k_0")) num("k_0", 1.0) else num("k", 1.0)
    val x0 = num("x_0", 0.0)
    val y0 = num("y_0", 0.0)

    proj match {
      case "longlat" => Spec(proj, ell, lat0, lon0, k0, x0, y0, 0, 0)
      case "merc" => Spec(proj, ell, lat0, lon0, k0, x0, y0, 0, 0)
      case "tmerc" =>
        // +lat_0 shifts the northing origin by the (scaled) rectifying
        // northing of lat_0 on the central meridian
        val refY = if (lat0 == 0.0) 0.0
          else Proj.tmForward(ell, lon0, lat0, lon0, k0, 0.0, 0.0)._2
        Spec(proj, ell, lat0, lon0, k0, x0, y0, 0, refY)
      case "laea" =>
        if (math.abs(lat0) > 89.9999) fail(s, "polar-aspect laea not implemented")
        Spec(proj, ell, lat0, lon0, k0, x0, y0, 0, 0)
      case other => fail(s, s"unsupported +proj=$other")
    }
  }

  def fromLonLat(spec: Spec, lon: Double, lat: Double): (Double, Double) = spec.proj match {
    case "epsg" => Proj.fromLonLat(spec.srid, lon, lat)
    case "longlat" => (lon, lat)
    case "merc" => Proj.mercForward(spec.ell, lon, lat, spec.lon0, spec.k0, spec.x0, spec.y0)
    case "tmerc" =>
      val (x, y) = Proj.tmForward(spec.ell, lon, lat, spec.lon0, spec.k0, spec.x0, spec.y0)
      (x, y - spec.tmRefY)
    case "laea" =>
      Proj.laeaForward(spec.ell, lon, lat, spec.lat0, spec.lon0, spec.x0, spec.y0)
  }

  def toLonLat(spec: Spec, x: Double, y: Double): (Double, Double) = spec.proj match {
    case "epsg" => Proj.toLonLat(spec.srid, x, y)
    case "longlat" => (x, y)
    case "merc" => Proj.mercInverse(spec.ell, x, y, spec.lon0, spec.k0, spec.x0, spec.y0)
    case "tmerc" => Proj.tmInverse(spec.ell, x, y + spec.tmRefY, spec.lon0, spec.k0,
      spec.x0, spec.y0)
    case "laea" => Proj.laeaInverse(spec.ell, x, y, spec.lat0, spec.lon0, spec.x0, spec.y0)
  }
}
