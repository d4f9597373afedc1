package graft

import scala.util.Random

import org.locationtech.jts.geom._

import graft.geom.{GeoJson, Wkb}
import graft.sources.Shapefile

/**
 * Seeded random-geometry round-trip properties for the two interchange
 * codecs (the repo's property idiom — seeded loops, exact assertions):
 * GeoJSON emit→parse must be `equalsExact` (bit-identical coordinates);
 * Shapefile write→read must be `norm().equalsExact` (the format only pins
 * ring orientation/start, not coordinate values — those are raw IEEE
 * doubles in .shp, so values are bit-exact).
 */
class GeoCodecFuzzSpec extends SparkSpec {

  private val f = Wkb.factory

  private def rndCoord(r: Random): Coordinate =
    new Coordinate(
      (r.nextDouble() - 0.5) * math.pow(10, r.nextInt(12) - 4),
      (r.nextDouble() - 0.5) * math.pow(10, r.nextInt(12) - 4))

  private def rndLine(r: Random): LineString = {
    val n = 2 + r.nextInt(8)
    f.createLineString(Array.fill(n)(rndCoord(r)))
  }

  /** Valid polygon: random box shell, up to 2 disjoint box holes inside. */
  private def rndPolygon(r: Random): Polygon = {
    val x = (r.nextDouble() - 0.5) * 1000
    val y = (r.nextDouble() - 0.5) * 1000
    val w = 10 + r.nextDouble() * 100
    val h = 10 + r.nextDouble() * 100
    def ring(x0: Double, y0: Double, x1: Double, y1: Double) =
      f.createLinearRing(Array(
        new Coordinate(x0, y0), new Coordinate(x1, y0), new Coordinate(x1, y1),
        new Coordinate(x0, y1), new Coordinate(x0, y0)))
    val nHoles = r.nextInt(3)
    // carve holes from disjoint thirds of the box so they never touch
    val holes = (0 until nHoles).map { i =>
      val hx = x + w * (i * 0.33 + 0.05)
      val hy = y + h * 0.2
      ring(hx, hy, hx + w * 0.2, hy + h * 0.3)
    }.toArray
    f.createPolygon(ring(x, y, x + w, y + h), holes)
  }

  private def rndGeom(r: Random): Geometry = r.nextInt(7) match {
    case 0 => f.createPoint(rndCoord(r))
    case 1 => rndLine(r)
    case 2 => rndPolygon(r)
    case 3 => f.createMultiPointFromCoords(Array.fill(1 + r.nextInt(6))(rndCoord(r)))
    case 4 => f.createMultiLineString(Array.fill(1 + r.nextInt(4))(rndLine(r)))
    case 5 =>
      // disjoint members: translate each polygon far apart on a grid
      val n = 1 + r.nextInt(3)
      f.createMultiPolygon(Array.tabulate(n) { i =>
        val p = rndPolygon(r)
        org.locationtech.jts.geom.util.AffineTransformation
          .translationInstance(i * 1e5, 0).transform(p).asInstanceOf[Polygon]
      })
    case 6 => f.createGeometryCollection(Array(f.createPoint(rndCoord(r)), rndLine(r)))
  }

  test("property: GeoJSON emit->parse is equalsExact on 400 random geometries") {
    val r = new Random(20260817)
    (0 until 400).foreach { i =>
      val g = rndGeom(r)
      val back = GeoJson.read(GeoJson.write(g))
      assert(back.equalsExact(g), s"iteration $i: ${GeoJson.write(g).take(200)}")
    }
  }

  test("property: GeoJSON round-trip through WKB kernels matches (50 random)") {
    val r = new Random(7)
    (0 until 50).foreach { _ =>
      val g = rndGeom(r)
      val wkb = Wkb.write(g)
      val back = GeoJson.fromGeoJson(GeoJson.asGeoJson(wkb))
      assert(java.util.Arrays.equals(back, wkb))
    }
  }

  test("property: Shapefile write->read is norm-equalsExact per shape class") {
    val r = new Random(424242)
    // one directory per shape class (a shapefile holds one shape type)
    val classes: Seq[(String, () => Geometry)] = Seq(
      ("pt", () => f.createPoint(rndCoord(r))),
      ("mpt", () => f.createMultiPointFromCoords(Array.fill(1 + r.nextInt(6))(rndCoord(r)))),
      ("ln", () => if (r.nextBoolean()) rndLine(r)
        else f.createMultiLineString(Array.fill(2 + r.nextInt(3))(rndLine(r)))),
      ("pg", () => if (r.nextBoolean()) rndPolygon(r)
        else f.createMultiPolygon(Array.tabulate(1 + r.nextInt(3)) { i =>
          org.locationtech.jts.geom.util.AffineTransformation
            .translationInstance(i * 1e5, 0).transform(rndPolygon(r)).asInstanceOf[Polygon]
        })))
    classes.foreach { case (tag, gen) =>
      val dir = java.nio.file.Files.createTempDirectory(s"shpfuzz-$tag").toString
      val gs = (0 until 60).map(i => (i.toLong, gen()))
      val rows = gs.map { case (i, g) => (i, Wkb.write(g)) }
      Shapefile.write(spark.createDataFrame(rows).toDF("id", "geometry")
        .repartition(2), dir)
      val back = Shapefile.read(spark, dir)
        .select("id", "geometry").collect()
        .map(row => row.getLong(0) -> Wkb.read(row.getAs[Array[Byte]](1))).toMap
      gs.foreach { case (i, g) =>
        val b = back(i)
        // single-part MultiLineString reads back as LineString (the format
        // cannot distinguish them) — compare through normalized line merge
        val expected = g match {
          case m: MultiLineString if m.getNumGeometries == 1 => m.getGeometryN(0)
          case m: MultiPolygon if m.getNumGeometries == 1 => m.getGeometryN(0)
          case other => other
        }
        assert(b.norm().equalsExact(expected.norm()),
          s"$tag $i: ${expected.getGeometryType} -> ${b.getGeometryType}")
      }
    }
  }
}
