package graft.index

/**
 * Slippy-map (web mercator, z/x/y) tile ids — the raster<->vector tiling side
 * of the engine (BASELINE.json:6 "zoom-level tile-ID assignment"). Standard
 * OSM tile math; packed into one Long so the tile id is a cheap shuffle /
 * partition key.
 *
 * Packing: bits 63..58 = zoom (0..29), bits 57..29 = x, bits 28..0 = y.
 */
object Tile {
  final val MaxZoom = 29

  def tileX(lonDeg: Double, z: Int): Long = {
    val n = 1L << z
    val x = math.floor((lonDeg + 180.0) / 360.0 * n).toLong
    math.max(0L, math.min(n - 1, x))
  }

  def tileY(latDeg: Double, z: Int): Long = {
    val n = 1L << z
    val latRad = math.toRadians(math.max(-85.05112878, math.min(85.05112878, latDeg)))
    val y = math.floor((1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi)
      / 2.0 * n).toLong
    math.max(0L, math.min(n - 1, y))
  }

  def pack(z: Int, x: Long, y: Long): Long =
    (z.toLong << 58) | (x << 29) | y

  def tileId(latDeg: Double, lonDeg: Double, z: Int): Long =
    pack(z, tileX(lonDeg, z), tileY(latDeg, z))

  def zoom(id: Long): Int = (id >>> 58).toInt
  def x(id: Long): Long = (id >>> 29) & ((1L << 29) - 1)
  def y(id: Long): Long = id & ((1L << 29) - 1)

  /** Parent tile at a coarser zoom — prefix relation for pruning. */
  def parent(id: Long, z: Int): Long = {
    val dz = zoom(id) - z
    require(dz >= 0, s"parent zoom $z above tile zoom ${zoom(id)}")
    pack(z, x(id) >> dz, y(id) >> dz)
  }

  /** Tile bounds in lon/lat degrees (west, south, east, north). */
  def bounds(id: Long): (Double, Double, Double, Double) = {
    val z = zoom(id); val n = (1L << z).toDouble
    val west = x(id) / n * 360.0 - 180.0
    val east = (x(id) + 1) / n * 360.0 - 180.0
    def lat(yy: Double): Double =
      math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2 * yy / n))))
    (west, lat((y(id) + 1).toDouble), east, lat(y(id).toDouble))
  }
}
