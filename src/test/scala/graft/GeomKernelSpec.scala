package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.GeomKernel._

/** Pure kernel tests (no Spark). */
class GeomKernelSpec extends AnyFunSuite {

  test("overlay: intersection/union/difference areas on boxes are exact") {
    val a = stMakeBox(0, 0, 10, 10)
    val b = stMakeBox(5, 5, 20, 20)
    assert(stArea(stIntersection(a, b)) == 25.0)
    assert(stArea(stUnion(a, b)) == 100.0 + 225.0 - 25.0)
    assert(stArea(stDifference(a, b)) == 75.0)
    assert(stArea(stSymDifference(a, b)) == 75.0 + 200.0)
    // disjoint
    val c = stMakeBox(100, 100, 101, 101)
    assert(stArea(stIntersection(a, c)) == 0.0)
  }

  test("buffer: area of buffered box equals closed-form fan formula (quadsegs=8)") {
    // JTS default buffer: straight sides offset by d + 4 corner fans of 8
    // segments each -> area = wh + 2(w+h)d + 2*8*d^2*sin(pi/16)
    val d = 2.0
    val area = stArea(stBuffer(stMakeBox(0, 0, 7, 3), d))
    val formula = 7.0 * 3 + 2 * (7 + 3) * d + 2 * 8 * d * d * math.sin(math.Pi / 16)
    assert(math.abs(area - formula) < 1e-9, s"area=$area formula=$formula")
  }

  test("geodesic: haversine equator degree ~ 111.19 km") {
    val d = graft.geom.Geodesic.haversine(0, 0, 0, 1)
    assert(math.abs(d - 111194.9) < 1.0)
  }

  test("truth table: polygon x multipolygon supports only intersects") {
    val p = stMakeBox(0, 0, 10, 10)
    val mpWkt = "MULTIPOLYGON(((1 1, 2 1, 2 2, 1 2, 1 1)))"
    val mp = stGeomFromText(org.apache.spark.unsafe.types.UTF8String.fromString(mpWkt))
    // (Polygon, MultiPolygon, Contains) has no arm in the reference -> false
    assert(!joinRefine(p, mp, PRED_CONTAINS))
    assert(joinRefine(p, mp, PRED_INTERSECTS))
    // but (MultiPolygon, Polygon, Contains) IS supported
    assert(joinRefine(mp, stMakeBox(1.2, 1.2, 1.8, 1.8), PRED_CONTAINS))
  }

  test("exterior of non-polygon is null; geom types match pygeos ids") {
    assert(stExterior(stPoint(1, 2)) == null)
    assert(stGeomType(stPoint(1, 2)) == POINT)
    assert(stGeomType(stMakeLine(0, 0, 1, 1)) == LINESTRING)
    assert(stGeomType(stMakeBox(0, 0, 1, 1)) == POLYGON)
    val mp = stGeomFromText(org.apache.spark.unsafe.types.UTF8String.fromString(
      "MULTIPOINT((1 1), (2 2))"))
    assert(stGeomType(mp) == MULTIPOINT)
    val gc = stGeomFromText(org.apache.spark.unsafe.types.UTF8String.fromString(
      "GEOMETRYCOLLECTION(POINT(1 1))"))
    assert(stGeomType(gc) == GEOMETRYCOLLECTION)
  }

  test("length: polygon uses exterior ring only (reference contract)") {
    // polygon with a hole: perimeter of hole must NOT count
    val wkt = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    val p = stGeomFromText(org.apache.spark.unsafe.types.UTF8String.fromString(wkt))
    assert(stLength(p) == 40.0) // JTS getLength would give 48
  }
}
