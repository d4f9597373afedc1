package graft.geom

/**
 * Geodesic distance on the WGS84 ellipsoid following Karney 2013
 * ("Algorithms for geodesics", J. Geod 87:43-55): auxiliary-sphere
 * formulation with the I1 (distance) and I3 (longitude) series in the
 * expansion parameter epsilon. The azimuth equation lambda12(alpha1) = target
 * is solved by bisection — lambda12 is monotone in alpha1 on (0, pi) — which
 * trades Karney's Newton step (and its J-integral derivative) for ~60 cheap
 * iterations with guaranteed convergence, including the nearly-antipodal
 * region where Vincenty fails.
 *
 * Accuracy: agrees with Vincenty to < 1 mm on non-antipodal pairs (property-
 * tested) and stays convergent where Vincenty diverges.
 */
object Karney {
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val B = A * (1 - F)
  private val E2 = F * (2 - F)           // e^2
  private val Ep2 = E2 / (1 - E2)        // e'^2
  private val N3 = F / (2 - F)           // third flattening n

  /** I1 series coefficients (Karney eq. 17/18, order eps^6). */
  private def a1(eps: Double): Double = {
    val e2 = eps * eps
    (1 + e2 * (1.0 / 4 + e2 * (1.0 / 64 + e2 / 256))) / (1 - eps)
  }
  private def c1(eps: Double): Array[Double] = {
    val e = eps; val e2 = e * e; val e3 = e2 * e; val e4 = e3 * e; val e5 = e4 * e; val e6 = e5 * e
    Array(
      -e / 2 + 3 * e3 / 16 - e5 / 32,
      -e2 / 16 + e4 / 32 - 9 * e6 / 2048,
      -e3 / 48 + 3 * e5 / 256,
      -5 * e4 / 512 + 3 * e6 / 512,
      -7 * e5 / 1280,
      -7 * e6 / 2048)
  }

  /** I3 series coefficients (Karney eq. 24/25, order eps^5, in n and eps). */
  private def a3(eps: Double): Double = {
    val n = N3
    1 - (1.0 / 2 - n / 2) * eps -
      (1.0 / 4 + n / 8 - 3 * n * n / 8) * eps * eps -
      (1.0 / 16 + 3 * n / 16 + n * n / 16) * eps * eps * eps -
      (3.0 / 64 + n / 32) * math.pow(eps, 4) -
      3.0 / 128 * math.pow(eps, 5)
  }
  private def c3(eps: Double): Array[Double] = {
    val n = N3
    val e = eps; val e2 = e * e; val e3 = e2 * e; val e4 = e3 * e; val e5 = e4 * e
    Array(
      (1.0 / 4 - n / 4) * e + (1.0 / 8 - n * n / 8) * e2 +
        (3.0 / 64 + 3 * n / 64 - n * n / 64) * e3 + (5.0 / 128 + n / 64) * e4 + 3.0 / 128 * e5,
      (1.0 / 16 - 3 * n / 32 + n * n / 32) * e2 + (3.0 / 64 - n / 32 - 3 * n * n / 64) * e3 +
        (3.0 / 128 + n / 128) * e4 + 5.0 / 256 * e5,
      (5.0 / 192 - 3 * n / 64 + 5 * n * n / 192) * e3 + (3.0 / 128 - 5 * n / 192) * e4 +
        7.0 / 512 * e5,
      (7.0 / 512 - 7 * n / 256) * e4 + 7.0 / 512 * e5,
      21.0 / 2560 * e5)
  }

  @inline private def sinSeries(c: Array[Double], sigma: Double): Double = {
    var s = 0.0
    var l = 0
    while (l < c.length) { s += c(l) * math.sin(2 * (l + 1) * sigma); l += 1 }
    s
  }

  /** Meridian arc length from reduced latitude beta1 to beta2 along sigma
   *  (alpha0 = 0: k^2 = e'^2). */
  private def meridianArc(sigma1: Double, sigma2: Double): Double = {
    val k2 = Ep2
    val eps = (math.sqrt(1 + k2) - 1) / (math.sqrt(1 + k2) + 1)
    val a1v = a1(eps); val c1v = c1(eps)
    B * a1v * ((sigma2 + sinSeries(c1v, sigma2)) - (sigma1 + sinSeries(c1v, sigma1)))
  }

  /** Inverse problem: distance in meters. */
  def distance(lat1Deg: Double, lon1Deg: Double, lat2Deg: Double, lon2Deg: Double): Double = {
    if (lat1Deg == lat2Deg && lon1Deg == lon2Deg) return 0.0

    // canonical arrangement: point 1 is the one with larger |beta|; make
    // beta1 <= 0 and lambda12 in [0, pi] (distance is invariant under all of
    // swap, lat negation, and lon reflection)
    var beta1 = math.atan((1 - F) * math.tan(math.toRadians(lat1Deg)))
    var beta2 = math.atan((1 - F) * math.tan(math.toRadians(lat2Deg)))
    var lam12 = {
      var d = math.toRadians(lon2Deg - lon1Deg) % (2 * math.Pi)
      if (d > math.Pi) d -= 2 * math.Pi
      if (d < -math.Pi) d += 2 * math.Pi
      math.abs(d)
    }
    if (math.abs(beta2) > math.abs(beta1)) { val t = beta1; beta1 = beta2; beta2 = t }
    if (beta1 > 0) { beta1 = -beta1; beta2 = -beta2 }

    val sb1 = math.sin(beta1); val cb1 = math.cos(beta1)
    val sb2 = math.sin(beta2); val cb2 = math.cos(beta2)

    // same meridian, or start at a pole (where every direction is a
    // meridian): a direct meridian arc, never over the pole — the near-
    // antipodal lam12 ~ pi case for non-polar points goes to the solver
    val nearPole1 = cb1 < 1e-12
    if (lam12 < 1e-12 || nearPole1) {
      val s1 = beta1
      val s2 = beta2
      return math.abs(meridianArc(math.min(s1, s2), math.max(s1, s2)))
    }
    // equatorial segment: only valid while lam12 <= (1-f)*pi
    if (math.abs(sb1) < 1e-12 && math.abs(sb2) < 1e-12 && lam12 <= (1 - F) * math.Pi)
      return A * lam12

    // lambda12 produced by azimuth alpha1 at point 1 (canonical: alpha1 in (0, pi))
    // returns (lambda12, sigma1, sigma2, eps) for the final distance evaluation
    def lambdaOf(alpha1: Double): (Double, Double, Double, Double) = {
      val sa1 = math.sin(alpha1); val ca1 = math.cos(alpha1)
      val sinAlpha0 = sa1 * cb1
      val cosAlpha0 = math.sqrt(1 - sinAlpha0 * sinAlpha0)
      val sigma1 = math.atan2(sb1, cb1 * ca1)
      val omega1 = math.atan2(sinAlpha0 * math.sin(sigma1), math.cos(sigma1))
      // Clairaut at point 2; canonical arrangement keeps cosAlpha2 >= 0
      val sinAlpha2 = math.min(1.0, sinAlpha0 / cb2)
      val cosAlpha2 = math.sqrt(math.max(0.0, 1 - sinAlpha2 * sinAlpha2))
      val sigma2 = math.atan2(sb2, cb2 * cosAlpha2)
      val omega2 = math.atan2(sinAlpha0 * math.sin(sigma2), math.cos(sigma2))
      val k2 = Ep2 * cosAlpha0 * cosAlpha0
      val eps = (math.sqrt(1 + k2) - 1) / (math.sqrt(1 + k2) + 1)
      val a3v = a3(eps); val c3v = c3(eps)
      val i3_1 = a3v * (sigma1 + sinSeries(c3v, sigma1))
      val i3_2 = a3v * (sigma2 + sinSeries(c3v, sigma2))
      val lam = (omega2 - omega1) - F * sinAlpha0 * (i3_2 - i3_1)
      (lam, sigma1, sigma2, eps)
    }

    // bisection on alpha1: lambda12(alpha1) decreases from ~pi-ish toward 0
    // is NOT the orientation — empirically lambdaOf is increasing in alpha1
    // here (alpha1 -> 0+: meridian-like path, lambda -> 0; alpha1 -> pi-:
    // lambda -> max). Bracket and bisect on the sign of (lam - target).
    var lo = 1e-15
    var hi = math.Pi - 1e-15
    val fLo = lambdaOf(lo)._1 - lam12
    val fHi = lambdaOf(hi)._1 - lam12
    if (fLo * fHi > 0) {
      // target outside the bracket (numerical edge, e.g. exactly antipodal on
      // the equator): fall back to the closer endpoint
      val use = if (math.abs(fLo) < math.abs(fHi)) lo else hi
      val (_, s1, s2, eps) = lambdaOf(use)
      val a1v = a1(eps); val c1v = c1(eps)
      return math.abs(B * a1v * ((s2 + sinSeries(c1v, s2)) - (s1 + sinSeries(c1v, s1))))
    }
    val increasing = fLo < 0
    var it = 0
    while (it < 80 && hi - lo > 1e-15) {
      val mid = (lo + hi) / 2
      val f = lambdaOf(mid)._1 - lam12
      if ((f < 0) == increasing) lo = mid else hi = mid
      it += 1
    }
    val (_, s1, s2, eps) = lambdaOf((lo + hi) / 2)
    val a1v = a1(eps); val c1v = c1(eps)
    math.abs(B * a1v * ((s2 + sinSeries(c1v, s2)) - (s1 + sinSeries(c1v, s1))))
  }
}
