package graft.index

/**
 * Aperture-7 hexagonal hierarchical index (H3-style), built from first
 * principles on Eisenstein integers — the packed-Long hex companion to [[S2]]
 * required by the workload's north rule (H3 + S2 cell indexes as Long
 * columns). The H3 jar does not ship in this environment and the reference
 * repo contains no H3 values, so the contract here is determinism and the
 * structural properties (aperture-7 hierarchy, prefix-parent, ~hexagonal
 * equal-area cells), not bit-compatibility with Uber's library.
 *
 * Construction:
 *  - The sphere is split into 20 icosahedron faces (vertices from the golden
 *    ratio, no tables); points project gnomonically onto their nearest face.
 *  - The face plane carries a triangular lattice addressed as Eisenstein
 *    integers z = a + b*omega, omega = e^{i*pi/3}. Multiplication by (2+omega)
 *    (norm 7, arg ~19.1 deg) is exactly the aperture-7 subdivision: children
 *    of a cell are z*(2+omega) + d where d ranges over the 7 residues of
 *    Z[omega]/(2+omega) — this gives provably consistent parent/child/digit
 *    math with no rounding edge cases (a complete residue system).
 *  - Index layout (H3-inspired): [4 mode=1][4 res][6 face][45 = 15 x 3-bit
 *    digits], unused digits = 7. Parent at res r = digits below r set to 7 —
 *    cell-prefix bucketing is a bitmask, like S2.
 */
object H3 {
  final val MaxRes = 15

  // icosahedron geometry, computed (golden ratio), not tabulated
  private val phi = (1.0 + math.sqrt(5.0)) / 2.0
  private val verts: Array[Array[Double]] = {
    val raw = Array(
      Array(-1.0, phi, 0.0), Array(1.0, phi, 0.0), Array(-1.0, -phi, 0.0), Array(1.0, -phi, 0.0),
      Array(0.0, -1.0, phi), Array(0.0, 1.0, phi), Array(0.0, -1.0, -phi), Array(0.0, 1.0, -phi),
      Array(phi, 0.0, -1.0), Array(phi, 0.0, 1.0), Array(-phi, 0.0, -1.0), Array(-phi, 0.0, 1.0))
    raw.map(normalize)
  }
  private val faceVerts: Array[Array[Int]] = Array(
    Array(0, 11, 5), Array(0, 5, 1), Array(0, 1, 7), Array(0, 7, 10), Array(0, 10, 11),
    Array(1, 5, 9), Array(5, 11, 4), Array(11, 10, 2), Array(10, 7, 6), Array(7, 1, 8),
    Array(3, 9, 4), Array(3, 4, 2), Array(3, 2, 6), Array(3, 6, 8), Array(3, 8, 9),
    Array(4, 9, 5), Array(2, 4, 11), Array(6, 2, 10), Array(8, 6, 7), Array(9, 8, 1))

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v(0) * v(0) + v(1) * v(1) + v(2) * v(2))
    Array(v(0) / n, v(1) / n, v(2) / n)
  }

  private val faceCenters: Array[Array[Double]] = faceVerts.map { f =>
    normalize(Array(
      verts(f(0))(0) + verts(f(1))(0) + verts(f(2))(0),
      verts(f(0))(1) + verts(f(1))(1) + verts(f(2))(1),
      verts(f(0))(2) + verts(f(1))(2) + verts(f(2))(2)))
  }

  // per-face orthonormal basis in the tangent plane: u toward vertex 0
  private val faceU: Array[Array[Double]] = faceVerts.indices.map { f =>
    val c = faceCenters(f); val v0 = verts(faceVerts(f)(0))
    val d = (0 to 2).map(i => v0(i) - (v0(0) * c(0) + v0(1) * c(1) + v0(2) * c(2)) * c(i)).toArray
    normalize(d)
  }.toArray
  private val faceV: Array[Array[Double]] = faceVerts.indices.map { f =>
    val c = faceCenters(f); val u = faceU(f)
    // v = c x u
    normalize(Array(
      c(1) * u(2) - c(2) * u(1), c(2) * u(0) - c(0) * u(2), c(0) * u(1) - c(1) * u(0)))
  }.toArray

  /** Base hex size on the gnomonic plane at res 0 (radians-scale). Chosen so
   *  a face (circumradius ~0.66 on the plane) spans a few res-0 hexagons. */
  private val Size0 = 0.35

  // (2+omega) as a complex number: 2 + e^{i pi/3} = 2.5 + i*sqrt(3)/2
  private val ApRe = 2.5
  private val ApIm = math.sqrt(3.0) / 2.0

  @inline private def latLonToXyz(latDeg: Double, lonDeg: Double): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val c = math.cos(lat)
    (c * math.cos(lon), c * math.sin(lon), math.sin(lat))
  }

  def faceOf(latDeg: Double, lonDeg: Double): Int = {
    val (x, y, z) = latLonToXyz(latDeg, lonDeg)
    var best = 0; var bestDot = -2.0
    var f = 0
    while (f < 20) {
      val c = faceCenters(f)
      val d = x * c(0) + y * c(1) + z * c(2)
      if (d > bestDot) { bestDot = d; best = f }
      f += 1
    }
    best
  }

  /** Gnomonic projection onto the face tangent plane. */
  private def toFace2d(face: Int, x: Double, y: Double, z: Double): (Double, Double) = {
    val c = faceCenters(face)
    val d = x * c(0) + y * c(1) + z * c(2)
    val px = x / d; val py = y / d; val pz = z / d
    val u = faceU(face); val v = faceV(face)
    ((px - c(0)) * u(0) + (py - c(1)) * u(1) + (pz - c(2)) * u(2),
      (px - c(0)) * v(0) + (py - c(1)) * v(1) + (pz - c(2)) * v(2))
  }

  /** Round a complex point to the nearest Eisenstein integer a + b*omega
   *  (triangular-lattice a.k.a. hex-center rounding via cube coords). */
  private def eisensteinRound(re: Double, im: Double): (Long, Long) = {
    // z = a + b*omega, omega = (1 + i*sqrt3)/2  =>  b = im/(sqrt3/2), a = re - b/2.
    // (a, b) ARE standard pointy-top axial coords (x = a + b/2, y = b*sqrt3/2),
    // so cube-round directly on them: x=a, z=b, y=-a-b.
    val bF = im / (math.sqrt(3.0) / 2.0)
    val aF = re - bF / 2.0
    var q = math.round(aF).toDouble; var r = math.round(bF).toDouble
    val s = math.round(-aF - bF).toDouble
    val dq = math.abs(q - aF); val dr = math.abs(r - bF); val ds = math.abs(s + aF + bF)
    if (dq > dr && dq > ds) q = -r - s
    else if (dr > ds) r = -q - s
    (q.toLong, r.toLong)
  }

  /** up = round(z / (2+omega)); exact integer arithmetic via z*(3-omega)/7. */
  private def up7(a: Long, b: Long): (Long, Long) = {
    // (a + b*omega)(3 - omega) = (3a + b) + (2b - a)*omega   [omega^2 = omega - 1]
    val na = 3 * a + b
    val nb = 2 * b - a
    // divide by 7 with Eisenstein rounding (exact rational -> nearest lattice)
    eisensteinRound(
      (na.toDouble + nb.toDouble / 2.0) / 7.0,
      nb.toDouble * (math.sqrt(3.0) / 2.0) / 7.0)
  }

  /** down = z * (2+omega). */
  @inline private def down7(a: Long, b: Long): (Long, Long) =
    (2 * a - b, a + 3 * b) // (a+b*omega)(2+omega) = (2a - b) + (a + 3b)*omega

  /** The 7 canonical residues of Z[omega]/(2+omega): 0 and the six units. */
  private val digitToUnit: Array[(Long, Long)] = Array(
    (0L, 0L), (1L, 0L), (0L, 1L), (-1L, 1L), (-1L, 0L), (0L, -1L), (1L, -1L))
  private def unitToDigit(da: Long, db: Long): Int = {
    var d = 0
    while (d < 7) {
      if (digitToUnit(d)._1 == da && digitToUnit(d)._2 == db) return d
      d += 1
    }
    -1
  }

  /**
   * One hierarchy step: find parent p and digit d with z = (2+omega)*p + u_d.
   * Nearest-rounding puts p within one lattice step of the true parent (the
   * canonical residue has norm <= sqrt(3) < sqrt(7)), so searching the
   * rounded candidate and its 6 neighbors always finds the unique unit
   * residue — Z[omega]/(2+omega) is a complete residue system of size 7.
   */
  private def upStep(a: Long, b: Long): (Long, Long, Int) = {
    val (ua0, ub0) = up7(a, b)
    var e = 0
    while (e < 7) {
      val ua = ua0 + digitToUnit(e)._1
      val ub = ub0 + digitToUnit(e)._2
      val (da, db) = down7(ua, ub)
      val digit = unitToDigit(a - da, b - db)
      if (digit >= 0) return (ua, ub, digit)
      e += 1
    }
    throw new IllegalStateException(s"h3: no unit residue for ($a,$b)") // unreachable
  }

  /** lat/lon degrees -> (face, Eisenstein lattice coords) at `res`. */
  private def lattice(latDeg: Double, lonDeg: Double, res: Int): (Int, Long, Long) = {
    val (x, y, z) = latLonToXyz(latDeg, lonDeg)
    val face = faceOf(latDeg, lonDeg)
    val (px, py) = toFace2d(face, x, y, z)
    // lattice coords at `res`: z2d / Size0 * (2+omega)^res
    var re = px / Size0; var im = py / Size0
    var r = 0
    while (r < res) {
      val nre = re * ApRe - im * ApIm
      val nim = re * ApIm + im * ApRe
      re = nre; im = nim
      r += 1
    }
    val (a, b) = eisensteinRound(re, im)
    (face, a, b)
  }

  /** Digit extraction + packing for a lattice point at `res` on `face`. */
  private def packLattice(face: Int, aIn: Long, bIn: Long, res: Int): Long = {
    var a = aIn; var b = bIn
    val digits = new Array[Int](res)
    var k = res - 1
    while (k >= 0) {
      val (ua, ub, digit) = upStep(a, b)
      digits(k) = digit
      a = ua; b = ub
      k -= 1
    }
    pack(face, res, digits, a, b)
  }

  /** Cell center of lattice point (a,b) at `res` on `face` -> (lat, lon):
   *  the exact inverse of `lattice` (plane coords, inverse gnomonic). */
  private def latticeCenter(face: Int, a: Long, b: Long, res: Int): (Double, Double) = {
    // (2+omega)^res as a complex number
    var pr = 1.0; var pi = 0.0
    var r = 0
    while (r < res) {
      val nr = pr * ApRe - pi * ApIm
      val ni = pr * ApIm + pi * ApRe
      pr = nr; pi = ni; r += 1
    }
    // plane coords = Size0 * (a + b*omega) / (2+omega)^res
    val zx = a + b / 2.0
    val zy = b * (math.sqrt(3.0) / 2.0)
    val den = pr * pr + pi * pi
    val re = (zx * pr + zy * pi) / den * Size0
    val im = (zy * pr - zx * pi) / den * Size0
    val c = faceCenters(face); val u = faceU(face); val v = faceV(face)
    val p = normalize(Array(
      c(0) + re * u(0) + im * v(0),
      c(1) + re * u(1) + im * v(1),
      c(2) + re * u(2) + im * v(2)))
    (math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, p(2))))),
      math.toDegrees(math.atan2(p(1), p(0))))
  }

  /** lat/lon degrees -> packed cell at `res` (0..15). */
  def cell(latDeg: Double, lonDeg: Double, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"h3 res $res out of range")
    val (face, a, b) = lattice(latDeg, lonDeg, res)
    packLattice(face, a, b, res)
  }

  /** Pack. Res-0 lattice coords (a,b) live in a small range on the face
   *  (|a|,|b| <= ~3 at Size0=0.35); they're folded into the base-cell field.
   *
   *  Layout (63 bits, bit 63 clear so ids stay positive longs):
   *    bits  0..44  fifteen 3-bit digits, coarsest (d=0) highest; unused = 7
   *    bits 45..52  res-0 lattice coords, (a0+4)<<4 | (b0+4)
   *    bits 53..57  icosahedron face (0..19)
   *    bits 58..61  resolution (0..15)
   *    bit  62      mode bit (always 1 — distinguishes a cell id from 0/NULL)
   *  Every field has its own bits: pack is injective per (face, a0, b0,
   *  digits), so distinct cells can never share an id. */
  private def pack(face: Int, res: Int, digits: Array[Int], a0: Long, b0: Long): Long = {
    // Gnomonic face coords are bounded by the face circumradius (~0.77) so
    // |a0|,|b0| <= ceil(0.77/Size0/sin60) + 1 = 4; fail loudly, never corrupt.
    require(a0 >= -4 && a0 <= 4 && b0 >= -4 && b0 <= 4,
      s"h3 res-0 coord out of range: ($a0,$b0) face=$face")
    val ab = ((a0 + 4) << 4) | (b0 + 4)
    var h = (1L << 62) | (res.toLong << 58) | (face.toLong << 53) | (ab << 45)
    var d = 0
    while (d < MaxRes) {
      val digit = if (d < res) digits(d) else 7
      h |= digit.toLong << (3 * (MaxRes - 1 - d))
      d += 1
    }
    h
  }

  def resolution(h: Long): Int = ((h >> 58) & 0xf).toInt
  def face(h: Long): Int = ((h >> 53) & 0x1f).toInt

  /** Parent at coarser `res`: digits below it become 7. Prefix property:
   *  a cell's packed id differs from its parent only in low digit bits. */
  def parent(h: Long, res: Int): Long = {
    val r = resolution(h)
    require(res <= r, s"parent res $res above cell res $r")
    var out = (h & ~(0xfL << 58)) | (res.toLong << 58)
    var d = res
    while (d < MaxRes) {
      out |= 7L << (3 * (MaxRes - 1 - d))
      d += 1
    }
    out
  }

  def isParentOf(parentId: Long, childId: Long): Boolean =
    parent(childId, resolution(parentId)) == parentId

  /** Approximate hex circumradius in degrees at `res` (for coverings). */
  def approxEdgeDeg(res: Int): Double =
    math.toDegrees(Size0 / math.pow(math.sqrt(7.0), res))

  /**
   * Complete covering of a lat/lon rectangle at `res` by lattice flood fill —
   * O(cells in the cover), not O((area/pitch)^2) point sampling. BFS runs in
   * (face, a, b) lattice space: a node is a member when its cell center lies
   * inside the rect expanded by one hex circumradius (any point's home cell
   * has its center within one circumradius of the point, so members are a
   * superset of every contained point's cell). Members whose center homes on
   * a different face are re-seeded on that face's lattice, which stitches the
   * search across icosahedron edges; a coarse seed grid (pitch below the
   * face inradius) guarantees every face region the rect touches is reached.
   */
  /**
   * Grid disk (Uber H3's `gridDisk` / k-ring) around a POINT: every cell
   * within `k` hex steps of the cell containing (lat, lon), at `res`. In
   * axial (a, b) lattice coordinates hex distance is
   * (|da| + |db| + |da+db|) / 2, so the disk is the standard hex ball:
   * exactly 1 + 3k(k+1) cells. Computed face-locally on the center's home
   * face; within ~k cell widths of an icosahedron face seam the ids of
   * cross-seam cells come from THIS face's lattice extension (consistent
   * with coverRect's covering contract — a superset-style candidate set,
   * cells deduplicate by id downstream).
   */
  def disk(latDeg: Double, lonDeg: Double, res: Int, k: Int): Array[Long] = {
    require(k >= 0, "grid disk needs k >= 0")
    val (f, a, b) = lattice(latDeg, lonDeg, res)
    val out = new Array[Long](1 + 3 * k * (k + 1))
    var p = 0
    var da = -k
    while (da <= k) {
      // axial ball: db in [max(-k, -da-k), min(k, -da+k)]
      var db = math.max(-k.toLong, -da.toLong - k)
      val hi = math.min(k.toLong, -da.toLong + k)
      while (db <= hi) {
        out(p) = packLattice(f, a + da, b + db, res)
        p += 1
        db += 1
      }
      da += 1
    }
    out
  }

  def coverRect(minLat: Double, minLon: Double, maxLat: Double, maxLon: Double,
                res: Int): Array[Long] = {
    val margin = approxEdgeDeg(res) * 1.5
    val latLo = math.max(-90.0, minLat - margin)
    val latHi = math.min(90.0, maxLat + margin)
    // lon margin grows with latitude; near the pole accept every longitude
    val maxAbsLat = math.min(89.99, math.max(math.abs(latLo), math.abs(latHi)))
    val lonMargin = margin / math.max(0.01, math.cos(math.toRadians(maxAbsLat)))
    val lonLo = minLon - lonMargin
    val lonSpan = (maxLon + lonMargin) - lonLo
    val allLons = lonSpan >= 360.0 || latHi >= 89.99 || latLo <= -89.99

    def member(lat: Double, lon: Double): Boolean = {
      if (lat < latLo || lat > latHi) return false
      if (allLons) return true
      // wrap-aware: normalize lon into [lonLo, lonLo + 360)
      var d = (lon - lonLo) % 360.0
      if (d < 0) d += 360.0
      d <= lonSpan
    }

    val emitted = new scala.collection.mutable.HashSet[Long]
    val visited = new scala.collection.mutable.HashSet[(Int, Long, Long)]
    val queue = new scala.collection.mutable.ArrayDeque[(Int, Long, Long)]

    def push(node: (Int, Long, Long)): Unit =
      if (visited.add(node)) queue.append(node)

    // seed grid: pitch under the face inradius (~20 deg) so no face region
    // intersecting the rect is missed; O(area/15^2) seeds, trivial
    val latStep = math.max(1e-7, math.min(15.0, maxLat - minLat + 1e-9))
    val lonStep = math.max(1e-7, math.min(15.0, maxLon - minLon + 1e-9))
    var la = minLat
    while (la <= maxLat + 1e-12) {
      var lo = minLon
      while (lo <= maxLon + 1e-12) {
        push(lattice(math.max(-89.9999, math.min(89.9999, la)),
          math.max(-179.9999, math.min(179.9999, lo)), res))
        lo += lonStep
      }
      la += latStep
    }

    val neighbors = Array((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L), (1L, -1L), (-1L, 1L))
    while (queue.nonEmpty) {
      val (f, a, b) = queue.removeHead()
      val (clat, clon) = latticeCenter(f, a, b, res)
      if (member(clat, clon)) {
        // emit every member node: a point on THIS face near the seam can
        // home to a lattice node whose center projects past the boundary, so
        // home-face filtering would drop real cells. Extra seam-side ids are
        // a harmless superset — coverings are candidate filters.
        emitted += packLattice(f, a, b, res)
        if (faceOf(clat, clon) != f) {
          // center homes on another face: re-seed there (cross-edge stitch)
          push(lattice(clat, clon, res))
        }
        var i = 0
        while (i < 6) {
          push((f, a + neighbors(i)._1, b + neighbors(i)._2))
          i += 1
        }
      }
    }
    emitted.toArray
  }
}
