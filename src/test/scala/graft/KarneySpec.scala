package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.{Geodesic, Karney}

class KarneySpec extends AnyFunSuite {

  test("karney: known values (GeographicLib-checked anchors)") {
    // the equator is itself a geodesic: distance = a * dLambda EXACTLY
    // (closed form, engine-independent) — a quarter is 10018754.171394622 m
    assert(math.abs(Karney.distance(0, 0, 0, 90) - 6378137.0 * math.Pi / 2) < 1e-3)
    assert(math.abs(Karney.distance(0, -10, 0, 35) -
      6378137.0 * math.toRadians(45.0)) < 1e-3)
    // quarter meridian (equator to pole) = 10001965.729 m on WGS84
    assert(math.abs(Karney.distance(0, 0, 90, 0) - 10001965.729) < 0.01)
    // same point
    assert(Karney.distance(12.34, 56.78, 12.34, 56.78) == 0.0)
  }

  test("karney agrees with vincenty to < 1 mm on random non-antipodal pairs") {
    val rnd = new scala.util.Random(99)
    var worst = 0.0
    (0 until 3000).foreach { _ =>
      val lat1 = rnd.nextDouble() * 160 - 80
      val lon1 = rnd.nextDouble() * 360 - 180
      val lat2 = rnd.nextDouble() * 160 - 80
      val lon2 = rnd.nextDouble() * 360 - 180
      // skip the nearly-antipodal band where Vincenty itself is unreliable
      val hv = Geodesic.haversine(lat1, lon1, lat2, lon2)
      if (hv < 19_500_000) {
        val k = Karney.distance(lat1, lon1, lat2, lon2)
        val v = Geodesic.vincenty(lat1, lon1, lat2, lon2)
        val d = math.abs(k - v)
        if (d > worst) worst = d
        assert(d < 1e-3, s"karney=$k vincenty=$v at ($lat1,$lon1)->($lat2,$lon2)")
      }
    }
    info(f"worst |karney - vincenty| = $worst%.2e m")
  }

  test("karney stays sane in the nearly-antipodal region") {
    // near-antipodal distances lie between the meridian-through-pole bound
    // and half the equatorial circumference bound
    val cases = Seq(
      (0.5, 0.0, -0.4, 179.8), (10.0, 10.0, -10.1, -169.9), (45.0, 0.0, -44.9, 179.95))
    cases.foreach { case (a, b, c, d) =>
      val k = Karney.distance(a, b, c, d)
      assert(k > 19_800_000 && k < 20_040_000, s"antipodal distance $k for ($a,$b)->($c,$d)")
    }
  }

  test("karney handles poles and meridional paths") {
    assert(math.abs(Karney.distance(90, 0, -90, 0) - 2 * 10001965.729) < 0.1)
    assert(math.abs(Karney.distance(40, 7, 50, 7) -
      Geodesic.vincenty(40, 7, 50, 7)) < 1e-3)
    assert(math.abs(Karney.distance(90, 123, 45, -17) -
      Geodesic.vincenty(90, 123, 45, -17)) < 1e-3)
  }
}
