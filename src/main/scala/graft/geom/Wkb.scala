package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter, ByteOrderValues}

/**
 * WKB codec over JTS. The reference engine stores geometries as WKB bytes in a
 * binary Arrow column (reference: geopolars/geopolars-geo/src/util.rs:11-37,
 * README.md:82-85); we use the same on-wire encoding in a Spark `BinaryType`
 * column: 2D (XY), little-endian — the byte order `geozero::ToWkb` emits.
 *
 * JTS objects are NOT thread-safe for readers/writers, and Spark evaluates
 * expressions on many executor threads in one JVM, so every codec object is
 * thread-local. The `GeometryFactory` itself is immutable/thread-safe.
 */
object Wkb {
  val factory: GeometryFactory = new GeometryFactory(new PrecisionModel(), 0)

  private val reader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val writer = ThreadLocal.withInitial[WKBWriter](() =>
    new WKBWriter(2, ByteOrderValues.LITTLE_ENDIAN))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))

  def read(wkb: Array[Byte]): Geometry = reader.get.read(wkb)
  def write(g: Geometry): Array[Byte] = writer.get.write(g)
  def readWkt(wkt: String): Geometry = wktReader.get.read(wkt)
  def writeWkt(g: Geometry): String = wktWriter.get.write(g)

  /** Max collection nesting depth [[structurallyValid]] accepts. JTS's
   *  WKBReader recurses once per nesting level, so unbounded depth in
   *  crafted bytes means StackOverflowError; real geometries nest 2-3. */
  val MaxNestingDepth = 32

  /**
   * Cheap bounded structural scan of WKB bytes — validates every count field
   * against the REMAINING buffer length before anything allocates from it.
   * JTS's WKBReader pre-allocates coordinate/geometry arrays straight from
   * untrusted count fields, so crafted bytes (a claimed 2^31-point ring in a
   * 50-byte buffer) throw OutOfMemoryError, and deep collection nesting
   * throws StackOverflowError — VM errors that would escape a
   * `catch Exception` quarantine and kill the executor. This scanner is the
   * gate in front of it: iterative (explicit stack, no recursion), O(bytes),
   * zero allocation beyond the stack, accepts both ISO (+1000/+2000 type
   * offsets) and EWKB (flag bits + optional SRID) Z/M encodings like
   * WKBReader does. Returns false on ANY structural doubt.
   */
  def structurallyValid(b: Array[Byte]): Boolean = {
    if (b == null) return false
    var pos = 0
    // pending[d] = geometries still to scan at depth d
    val pending = new Array[Int](MaxNestingDepth + 1)
    var depth = 0
    pending(0) = 1

    def u32(le: Boolean, p: Int): Long = {
      val (b0, b1, b2, b3) = (b(p) & 0xffL, b(p + 1) & 0xffL, b(p + 2) & 0xffL, b(p + 3) & 0xffL)
      if (le) b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
      else (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
    }

    while (depth >= 0) {
      if (pending(depth) == 0) { depth -= 1 }
      else {
        pending(depth) -= 1
        if (pos + 5 > b.length) return false
        val order = b(pos)
        if (order != 0 && order != 1) return false
        val le = order == 1
        var raw = u32(le, pos + 1)
        pos += 5
        // EWKB flag bits, then optional SRID word
        val ewkbZ = (raw & 0x80000000L) != 0; val ewkbM = (raw & 0x40000000L) != 0
        val hasSrid = (raw & 0x20000000L) != 0
        raw &= 0x1fffffffL
        if (hasSrid) { if (pos + 4 > b.length) return false; pos += 4 }
        // ISO type offsets: +1000 Z, +2000 M, +3000 ZM
        val isoBlock = (raw / 1000L).toInt
        if (isoBlock > 3) return false
        val base = (raw % 1000L).toInt
        val dims = 2 + (if (ewkbZ || isoBlock == 1 || isoBlock == 3) 1 else 0) +
          (if (ewkbM || isoBlock == 2 || isoBlock == 3) 1 else 0)
        val ptBytes = dims * 8

        def countFits(n: Long, unitBytes: Long): Boolean =
          n >= 0 && n <= (b.length - pos - 4).max(0).toLong / unitBytes.max(1)

        // every count field itself needs 4 bytes of buffer before reading
        base match {
          case 1 => // Point (empty point = NaN coords, still dims doubles)
            if (pos + ptBytes > b.length) return false
            pos += ptBytes
          case 2 => // LineString
            if (pos + 4 > b.length) return false
            val n = u32(le, pos); if (!countFits(n, ptBytes)) return false
            pos += 4 + (n * ptBytes).toInt
          case 3 => // Polygon: nrings, each ring = count + points
            if (pos + 4 > b.length) return false
            val nr = u32(le, pos); if (!countFits(nr, 4)) return false
            pos += 4
            var i = 0L
            while (i < nr) {
              if (pos + 4 > b.length) return false
              val np = u32(le, pos); if (!countFits(np, ptBytes)) return false
              pos += 4 + (np * ptBytes).toInt
              i += 1
            }
          case 4 | 5 | 6 | 7 => // Multi* / GeometryCollection: n nested geoms
            if (pos + 4 > b.length) return false
            val n = u32(le, pos)
            // each nested geometry needs >= 5 bytes of header
            if (!countFits(n, 5)) return false
            pos += 4
            if (n > 0) {
              if (depth + 1 > MaxNestingDepth) return false
              depth += 1
              pending(depth) = n.toInt
            }
          case _ => return false
        }
      }
    }
    // trailing bytes after a complete geometry: WKBReader ignores them, so
    // the pre-scanner must too — the parse attempt keeps final authority
    true
  }
}
