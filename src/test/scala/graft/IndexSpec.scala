package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{H3, S2, Tile}

/** Pure-Scala index properties (no Spark needed). Property-style via seeded
 *  random sampling (the scalatestplus-scalacheck bridge is not in the
 *  offline cache). */
class IndexSpec extends AnyFunSuite {

  /** 200 seeded (lat, lon) samples. */
  private def forAllPoints(f: (Double, Double) => Unit): Unit = {
    val rnd = new scala.util.Random(20260816L)
    (0 until 200).foreach { _ =>
      f(rnd.nextDouble() * 168 - 84, rnd.nextDouble() * 358 - 179)
    }
  }
  private def forAllPointsRes(maxRes: Int)(f: (Double, Double, Int) => Unit): Unit = {
    val rnd = new scala.util.Random(42424242L)
    (0 until 200).foreach { _ =>
      f(rnd.nextDouble() * 168 - 84, rnd.nextDouble() * 358 - 179, rnd.nextInt(maxRes + 1))
    }
  }

  // ---------------- S2 ----------------

  test("s2: leaf id has level 30, sentinel bit set") {
    val id = S2.leafCell(45.0, 10.0)
    assert(S2.level(id) == 30)
    assert((id & 1L) == 1L)
  }

  test("s2: parent is a prefix (range containment) at every level") {
    forAllPoints { (lat, lon) =>
      val leaf = S2.leafCell(lat, lon)
      (0 to 29).foreach { lvl =>
        val p = S2.parent(leaf, lvl)
        assert(S2.level(p) == lvl)
        assert(S2.contains(p, leaf))
        assert(S2.parent(p, lvl) == p) // idempotent
        // parent chain is monotone: parent at lvl of parent at lvl+1 == parent at lvl
        assert(S2.parent(S2.parent(leaf, lvl + 1), lvl) == p)
      }
    }
  }

  test("s2: nearby points share coarse cells, far points do not") {
    val a = S2.cellId(48.8566, 2.3522, 9)   // Paris
    val b = S2.cellId(48.8570, 2.3530, 9)   // ~50m away
    val c = S2.cellId(-33.8688, 151.2093, 9) // Sydney
    assert(a == b)
    assert(a != c)
    assert(S2.cellId(48.8566, 2.3522, 4) == S2.parent(a, 4))
  }

  test("s2: coverRect covers every contained point's cell (completeness)") {
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { _ =>
      val lat0 = rnd.nextDouble() * 100 - 50
      val lon0 = rnd.nextDouble() * 300 - 150
      val dLat = rnd.nextDouble() * 8 + 0.1
      val dLon = rnd.nextDouble() * 8 + 0.1
      val lvl = 6
      val cover = S2.coverRect(lat0, lon0, lat0 + dLat, lon0 + dLon, lvl).toSet
      (0 until 200).foreach { _ =>
        val la = lat0 + rnd.nextDouble() * dLat
        val lo = lon0 + rnd.nextDouble() * dLon
        assert(cover.contains(S2.cellId(la, lo, lvl)),
          s"uncovered point ($la,$lo) in rect ($lat0,$lon0)+($dLat,$dLon)")
      }
    }
  }

  test("s2: coverRect complete for wide asymmetric rects at fine levels") {
    // regression for the single-face extent bug: u/v extrema of a rect edge
    // occur at the face-centre meridian / equator, not at corner samples, so
    // wide rects asymmetric about the meridian used to miss cells at lvl>=9
    val rnd = new scala.util.Random(99)
    val rects = Seq(
      // wide, asymmetric about face-0 meridian (the demonstrated failure)
      (3.0, -41.0, 9.0, 12.0), (-12.0, -40.5, -2.0, 30.0),
      // face-boundary straddlers
      (10.0, 40.0, 18.0, 52.0), (-20.0, 130.0, -8.0, 142.0),
      // polar and near-polar
      (62.0, -170.0, 79.0, 20.0), (-80.0, 10.0, -55.0, 100.0),
      // dateline-adjacent and equator straddler
      (5.0, 168.0, 15.0, 179.9), (-6.0, -179.9, 4.0, -150.0))
    for ((la0, lo0, la1, lo1) <- rects; lvl <- Seq(9, 10, 11, 12)) {
      val cover = S2.coverRect(la0, lo0, la1, lo1, lvl).toSet
      var k = 0
      while (k < 3000) {
        val la = la0 + rnd.nextDouble() * (la1 - la0)
        val lo = lo0 + rnd.nextDouble() * (lo1 - lo0)
        assert(cover.contains(S2.cellId(la, lo, lvl)),
          s"uncovered ($la,$lo) lvl=$lvl rect=($la0,$lo0,$la1,$lo1)")
        k += 1
      }
    }
  }

  test("s2: coverRect edge/corner stress (boundary-biased points)") {
    // points biased to rect edges and corners, where ij truncation +
    // face-boundary clamping interact
    val rnd = new scala.util.Random(123)
    (0 until 12).foreach { _ =>
      val la0 = rnd.nextDouble() * 140 - 70
      val lo0 = rnd.nextDouble() * 340 - 170
      val la1 = la0 + rnd.nextDouble() * 25 + 0.05
      val lo1 = lo0 + rnd.nextDouble() * 45 + 0.05
      val lvl = 8 + rnd.nextInt(3)
      val cover = S2.coverRect(la0, lo0, math.min(la1, 89.9), math.min(lo1, 179.9), lvl).toSet
      val laB = math.min(la1, 89.9); val loB = math.min(lo1, 179.9)
      val edgePts = Seq(
        (la0, lo0), (la0, loB), (laB, lo0), (laB, loB),
        (la0, (lo0 + loB) / 2), (laB, (lo0 + loB) / 2),
        ((la0 + laB) / 2, lo0), ((la0 + laB) / 2, loB)) ++
        (0 until 500).map { _ =>
          if (rnd.nextBoolean()) (if (rnd.nextBoolean()) la0 else laB,
            lo0 + rnd.nextDouble() * (loB - lo0))
          else (la0 + rnd.nextDouble() * (laB - la0), if (rnd.nextBoolean()) lo0 else loB)
        }
      edgePts.foreach { case (la, lo) =>
        assert(cover.contains(S2.cellId(la, lo, lvl)),
          s"uncovered edge point ($la,$lo) lvl=$lvl rect=($la0,$lo0,$laB,$loB)")
      }
    }
  }

  test("s2: coverRect size stays proportional to rect area (no face blowup)") {
    // a mid-latitude rect reaching into a polar face must not enumerate the
    // whole polar face
    val c = S2.coverRect(30.0, 0.0, 60.0, 90.0, 9)
    // rect is ~30x90 deg; at level 9 (~0.176 deg cells) the area bound is
    // ~(30/0.176)*(90/0.176)*distortion; whole-sphere would be 6*512*512=1.5M
    assert(c.length < 500000, s"covering exploded: ${c.length}")
    val small = S2.coverRect(40.0, 10.0, 40.5, 10.5, 9)
    assert(small.length < 120, s"small covering too big: ${small.length}")
  }

  test("s2: all six faces reachable") {
    val faces = Seq((0.0, 0.0), (0.0, 90.0), (89.0, 0.0), (0.0, 180.0), (0.0, -90.0),
      (-89.0, 0.0)).map { case (la, lo) => S2.face(S2.leafCell(la, lo)) }.toSet
    assert(faces == Set(0, 1, 2, 3, 4, 5))
  }

  // ---------------- H3 ----------------

  test("h3: resolution and face round-trip; digits padded with 7") {
    forAllPointsRes(15) { (lat, lon, res) =>
      val h = H3.cell(lat, lon, res)
      assert(H3.resolution(h) == res)
      assert(H3.face(h) >= 0 && H3.face(h) < 20)
    }
  }

  test("h3: packed fields are disjoint — digit slots read 0..6 below res, 7 at/above") {
    // Guards the id layout itself: an overlap between the base-cell field and
    // the digit region (the pre-fix layout OR'd ab<<38 across digits 0..2,
    // making pack lossy) corrupts digit reads and lets distinct cells collide.
    forAllPointsRes(15) { (lat, lon, res) =>
      val h = H3.cell(lat, lon, res)
      assert((h >>> 62) == 1L, s"mode/sign bits wrong: $h")
      (0 until H3.MaxRes).foreach { d =>
        val digit = (h >> (3 * (H3.MaxRes - 1 - d))) & 7
        if (d < res) assert(digit <= 6, s"digit $d=$digit res=$res")
        else assert(digit == 7, s"pad digit $d=$digit res=$res")
      }
    }
  }

  test("h3: parent chain is consistent and prefix-monotone") {
    forAllPoints { (lat, lon) =>
      val h = H3.cell(lat, lon, 12)
      (0 to 11).foreach { r =>
        val p = H3.parent(h, r)
        assert(H3.resolution(p) == r)
        assert(H3.isParentOf(p, h))
        assert(H3.parent(H3.parent(h, r + 1), r) == p)
      }
    }
  }

  test("h3: nearby points share cells at coarse res, distinct far away") {
    val a = H3.cell(48.8566, 2.3522, 9)
    val b = H3.cell(48.85661, 2.35221, 9)
    val c = H3.cell(-33.8688, 151.2093, 9)
    assert(a == b)
    assert(a != c)
  }

  test("h3: determinism across calls") {
    forAllPoints { (lat, lon) =>
      assert(H3.cell(lat, lon, 10) == H3.cell(lat, lon, 10))
    }
  }

  test("h3: aperture-7 — resolution r+1 refines r (child count sanity)") {
    // sample many points inside one res-6 cell; their res-7 cells must be
    // few (<= ~7 + boundary effects) and all children of some res-6 cell
    val base = H3.cell(40.0, -100.0, 6)
    val rnd = new scala.util.Random(11)
    val eps = H3.approxEdgeDeg(6) / 4
    val children = (0 until 500).map { _ =>
      val la = 40.0 + (rnd.nextDouble() - 0.5) * eps
      val lo = -100.0 + (rnd.nextDouble() - 0.5) * eps
      H3.cell(la, lo, 7)
    }.toSet
    assert(children.nonEmpty && children.size <= 9)
    val sameParent = children.filter(c => H3.parent(c, 6) == base)
    assert(sameParent.nonEmpty)
  }

  test("h3: coverRect covers every contained point's cell (completeness)") {
    val rnd = new scala.util.Random(13)
    (0 until 10).foreach { _ =>
      val lat0 = rnd.nextDouble() * 80 - 40
      val lon0 = rnd.nextDouble() * 300 - 150
      val dLat = rnd.nextDouble() * 3 + 0.1
      val dLon = rnd.nextDouble() * 3 + 0.1
      val res = 4
      val cover = H3.coverRect(lat0, lon0, lat0 + dLat, lon0 + dLon, res).toSet
      (0 until 100).foreach { _ =>
        val la = lat0 + rnd.nextDouble() * dLat
        val lo = lon0 + rnd.nextDouble() * dLon
        assert(cover.contains(H3.cell(la, lo, res)))
      }
    }
  }

  test("h3: coverRect complete at finer res, polar and face-boundary rects") {
    val rnd = new scala.util.Random(31)
    val rects = Seq(
      (3.0, -41.0, 7.0, -33.0), (48.0, 5.0, 52.0, 11.0),   // mid-lat
      (62.0, -10.0, 66.0, 3.0), (-66.0, 100.0, -62.0, 111.0), // high-lat
      (-1.5, 178.0, 1.5, 179.9))                            // dateline+equator
    for ((la0, lo0, la1, lo1) <- rects; res <- Seq(5, 6, 7)) {
      val cover = H3.coverRect(la0, lo0, la1, lo1, res).toSet
      (0 until 800).foreach { _ =>
        val la = la0 + rnd.nextDouble() * (la1 - la0)
        val lo = lo0 + rnd.nextDouble() * (lo1 - lo0)
        assert(cover.contains(H3.cell(la, lo, res)),
          s"h3 uncovered ($la,$lo) res=$res rect=($la0,$lo0,$la1,$lo1)")
      }
    }
  }

  test("h3: coverRect flood fill is O(cells) — country-sized bbox at res 8") {
    // the grid-sampling cover was O((area/pitch)^2): ~10^8 cell() calls for
    // this bbox at res 8. The lattice BFS must finish quickly with a cover
    // proportional to the cell count, and stay complete.
    val (la0, lo0, la1, lo1) = (44.0, 2.0, 51.0, 12.0) // ~France-sized
    val res = 8
    val t0 = System.nanoTime()
    val cover = H3.coverRect(la0, lo0, la1, lo1, res).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    // expected cell count ~ area / hex area; allow a generous band
    val hexEdge = H3.approxEdgeDeg(res)
    val expected = (la1 - la0) * (lo1 - lo0) * math.cos(math.toRadians(47.5)) /
      (2.598 * hexEdge * hexEdge / 4 * 3) // hex area = 3*sqrt(3)/2 * r^2
    assert(cover.size > expected / 4 && cover.size < expected * 6,
      s"cover=${cover.size} expected~$expected")
    assert(secs < 30.0, s"coverRect took ${secs}s — not O(cells)")
    val rnd = new scala.util.Random(17)
    (0 until 2000).foreach { _ =>
      val la = la0 + rnd.nextDouble() * (la1 - la0)
      val lo = lo0 + rnd.nextDouble() * (lo1 - lo0)
      assert(cover.contains(H3.cell(la, lo, res)), s"uncovered ($la,$lo)")
    }
  }

  test("h3: coverRect complete on polar and pole-containing rects") {
    val rnd = new scala.util.Random(41)
    for ((la0, lo0, la1, lo1) <- Seq(
      (84.0, -180.0, 90.0, 180.0), (-90.0, -180.0, -85.0, 180.0),
      (86.0, 10.0, 88.0, 60.0)); res <- Seq(4, 5)) {
      val cover = H3.coverRect(la0, lo0, la1, lo1, res).toSet
      (0 until 500).foreach { _ =>
        val la = math.min(89.9999, la0 + rnd.nextDouble() * (la1 - la0))
        val lo = lo0 + rnd.nextDouble() * (lo1 - lo0)
        assert(cover.contains(H3.cell(la, lo, res)),
          s"h3 polar uncovered ($la,$lo) res=$res rect=($la0,$lo0,$la1,$lo1)")
      }
    }
  }

  // ---------------- Tile ----------------

  test("h3: grid disk — hex-ball cardinality, self-containment, ring growth") {
    import graft.index.H3
    val pts = Seq((48.1, 11.6), (-33.9, 18.4), (0.3, -0.2), (40.7, -74.0), (55.7, 37.6))
    for ((lat, lon) <- pts; k <- 0 to 3) {
      val d = H3.disk(lat, lon, 8, k)
      assert(d.length == 1 + 3 * k * (k + 1), s"($lat,$lon) k=$k")
      assert(d.distinct.length == d.length)
      assert(d.contains(H3.cell(lat, lon, 8)))
      assert(d.forall(H3.resolution(_) == 8))
      // monotone: a smaller disk is a subset of a larger one
      if (k > 0) assert(H3.disk(lat, lon, 8, k - 1).toSet.subsetOf(d.toSet))
    }
    // k=0 is exactly the containing cell
    assert(H3.disk(48.1, 11.6, 9, 0).toSeq == Seq(H3.cell(48.1, 11.6, 9)))
    intercept[IllegalArgumentException](H3.disk(0, 0, 8, -1))
  }

  test("tile: known anchors at z=1 and packing round-trip") {
    // z=1: four tiles; (0,0) lon/lat -> tile (1,1)? lon 0 -> x=1, lat 0 -> y=1
    assert(Tile.tileX(0.0, 1) == 1)
    assert(Tile.tileY(0.0, 1) == 1)
    assert(Tile.tileX(-180.0, 1) == 0)
    forAllPointsRes(18) { (lat, lon, z) =>
      val id = Tile.tileId(lat, lon, z)
      assert(Tile.zoom(id) == z)
      assert(Tile.x(id) == Tile.tileX(lon, z))
      assert(Tile.y(id) == Tile.tileY(lat, z))
      // parent prefix property
      if (z > 0) assert(Tile.parent(id, z - 1) == Tile.tileId(lat, lon, z - 1) ||
        // boundary: a point exactly on a tile edge can legitimately round to
        // the adjacent child; parent must still be the shifted coordinates
        Tile.parent(id, z - 1) == Tile.pack(z - 1, Tile.x(id) >> 1, Tile.y(id) >> 1))
    }
  }

  test("tile: bounds contain the generating point") {
    forAllPointsRes(13) { (lat, lon, z0) =>
      val z = z0 + 2
      val id = Tile.tileId(lat, lon, z)
      val (w, s, e, n) = Tile.bounds(id)
      assert(lon >= w - 1e-9 && lon <= e + 1e-9)
      assert(lat >= s - 1e-6 && lat <= n + 1e-6)
    }
  }
}
