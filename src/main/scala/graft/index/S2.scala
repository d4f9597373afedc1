package graft.index

/**
 * Pure-Scala S2 cell ids (cube face + quadratic ST projection + Hilbert
 * curve), implemented from the published S2 geometry scheme. This is the
 * distributed analogue of the reference's per-Series R-tree: cell-prefix
 * equality replaces AABB candidate generation
 * (reference: geopolars/src/spatial_index.rs:314-350 builds `rstar::RTree`
 * node-per-row; we bucket rows by cell instead so candidates co-locate in the
 * same shuffle partition).
 *
 * Layout (standard S2): 3 face bits, 2*30 position bits along the Hilbert
 * curve, then a trailing sentinel 1-bit marking the level. Parent cells share
 * the child's high-order bits — "cell-prefix bucketing" is parent-id equality.
 */
object S2 {
  final val MaxLevel = 30

  // Hilbert sub-cell orderings. ij is encoded as i*2 + j.
  // posToIJ(orientation)(pos) = ij; ijToPos is its inverse.
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical order
    Array(0, 2, 3, 1), // axes swapped
    Array(3, 2, 0, 1), // bits inverted
    Array(3, 1, 0, 2)) // swapped & inverted
  private val ijToPos: Array[Array[Int]] = {
    val inv = Array.ofDim[Int](4, 4)
    for (r <- 0 until 4; pos <- 0 until 4) inv(r)(posToIJ(r)(pos)) = pos
    inv
  }
  private val SwapMask = 1
  private val InvertMask = 2
  private val posToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)

  /** lat/lon degrees -> leaf (level 30) cell id. */
  def leafCell(latDeg: Double, lonDeg: Double): Long = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val cosLat = math.cos(lat)
    val x = cosLat * math.cos(lon)
    val y = cosLat * math.sin(lon)
    val z = math.sin(lat)
    val face = largestAbsComponent(x, y, z)
    val (u, v) = faceXyzToUv(face, x, y, z)
    val i = stToIj(uvToSt(u))
    val j = stToIj(uvToSt(v))
    fromFaceIj(face, i, j)
  }

  /** lat/lon degrees -> cell id at `level` (0..30). */
  def cellId(latDeg: Double, lonDeg: Double, level: Int): Long =
    parent(leafCell(latDeg, lonDeg), level)

  /** Parent of `id` at `level` (must be <= id's level). */
  def parent(id: Long, level: Int): Long = {
    val lsb = 1L << (2 * (MaxLevel - level))
    (id & -lsb) | lsb
  }

  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def face(id: Long): Int = (id >>> 61).toInt

  /** Range [min, max] of leaf ids contained in this cell — enables range scans
   *  / partition pruning on a leaf-sorted layout. */
  def rangeMin(id: Long): Long = id - (lowestOnBit(id) - 1)
  def rangeMax(id: Long): Long = id + (lowestOnBit(id) - 1)
  private def lowestOnBit(id: Long): Long = id & -id

  def contains(parentId: Long, childId: Long): Boolean =
    childId >= rangeMin(parentId) && childId <= rangeMax(parentId)

  private def largestAbsComponent(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax > ay) {
      if (ax > az) { if (x >= 0) 0 else 3 } else { if (z >= 0) 2 else 5 }
    } else {
      if (ay > az) { if (y >= 0) 1 else 4 } else { if (z >= 0) 2 else 5 }
    }
  }

  private def faceXyzToUv(face: Int, x: Double, y: Double, z: Double): (Double, Double) =
    face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, x / z)
    }

  /** Quadratic projection — equalizes cell areas across a face. */
  private def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  private def stToIj(s: Double): Int = {
    val m = (1 << MaxLevel).toDouble
    math.max(0, math.min((1 << MaxLevel) - 1, math.floor(s * m).toInt))
  }

  /** (face, i, j) at level 30 -> leaf cell id via Hilbert curve traversal. */
  def fromFaceIj(face: Int, i: Int, j: Int): Long = {
    var pos = 0L
    var orientation = face & SwapMask
    var k = MaxLevel - 1
    while (k >= 0) {
      val ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
      val p = ijToPos(orientation)(ij)
      pos = (pos << 2) | p
      orientation ^= posToOrientation(p)
      k -= 1
    }
    (face.toLong << 61) | (pos << 1) | 1L
  }

  /** Approximate cell edge length in degrees at `level` (for coverings). */
  def approxEdgeDeg(level: Int): Double = 90.0 / (1L << level)

  /**
   * Complete covering of a lat/lon rectangle with cell ids at `level`.
   * Strategy: sample corners, edge midpoints and center to find the (face,i,j)
   * extent, then enumerate the ij-rectangle at `level`, expanded by one cell on
   * every side as a safety margin. For rectangles spanning multiple faces,
   * falls back to dense boundary sampling. Used for the polygon side of the
   * cell-bucketed spatial join; completeness (superset) is what matters —
   * refinement removes false positives.
   */
  def coverRect(minLat: Double, minLon: Double, maxLat: Double, maxLon: Double,
                lvl: Int): Array[Long] = {
    val samplesLat = Array(minLat, (minLat + maxLat) / 2, maxLat)
    val samplesLon = Array(minLon, (minLon + maxLon) / 2, maxLon)
    val pts = for (la <- samplesLat; lo <- samplesLon) yield (la, lo)
    val faces = pts.map { case (la, lo) => face(leafCell(la, lo)) }.distinct
    if (faces.length == 1) {
      // single face: enumerate ij rectangle
      val shift = 2 * 0 // ij at leaf precision, we shift below
      val ijs = pts.map { case (la, lo) =>
        val lat = math.toRadians(la); val lon = math.toRadians(lo)
        val cl = math.cos(lat)
        val x = cl * math.cos(lon); val y = cl * math.sin(lon); val z = math.sin(lat)
        val (u, v) = faceXyzToUv(faces(0), x, y, z)
        (stToIj(uvToSt(u)), stToIj(uvToSt(v)))
      }
      val cellShift = MaxLevel - lvl
      var i0 = ijs.map(_._1).min >> cellShift
      var i1 = ijs.map(_._1).max >> cellShift
      var j0 = ijs.map(_._2).min >> cellShift
      var j1 = ijs.map(_._2).max >> cellShift
      val maxIj = (1 << lvl) - 1
      i0 = math.max(0, i0 - 1); j0 = math.max(0, j0 - 1)
      i1 = math.min(maxIj, i1 + 1); j1 = math.min(maxIj, j1 + 1)
      val buf = new scala.collection.mutable.ArrayBuffer[Long]((i1 - i0 + 1) * (j1 - j0 + 1))
      var i = i0
      while (i <= i1) {
        var j = j0
        while (j <= j1) {
          buf += parent(fromFaceIj(faces(0), i << cellShift, j << cellShift), lvl)
          j += 1
        }
        i += 1
      }
      buf.toArray
    } else {
      // multi-face fallback: dense sampling at half-cell pitch (complete for
      // the rectangle sizes our layers use), plus neighbors via the ±pitch grid
      val pitch = approxEdgeDeg(lvl) / 2
      val set = new scala.collection.mutable.HashSet[Long]
      var la = minLat - pitch
      while (la <= maxLat + pitch) {
        var lo = minLon - pitch
        while (lo <= maxLon + pitch) {
          set += cellId(math.max(-89.9999, math.min(89.9999, la)),
            math.max(-179.9999, math.min(179.9999, lo)), lvl)
          lo += pitch
        }
        la += pitch
      }
      set.toArray
    }
  }
}
