package graft.index

/** StaticInvoke-facing wrappers over S2/Tile for Catalyst codegen. */
object IndexKernel {
  def s2Cell(lat: Double, lon: Double, level: Int): Long = S2.cellId(lat, lon, level)
  def s2Parent(cell: Long, level: Int): Long = S2.parent(cell, level)
  def s2Level(cell: Long): Int = S2.level(cell)
  def h3Cell(lat: Double, lon: Double, res: Int): Long = H3.cell(lat, lon, res)
  def h3Parent(cell: Long, res: Int): Long = H3.parent(cell, res)
  def h3Resolution(cell: Long): Int = H3.resolution(cell)
  def h3Face(cell: Long): Int = H3.face(cell)
  def h3Disk(lat: Double, lon: Double, res: Int, k: Int):
      org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      H3.disk(lat, lon, res, k).map(x => x: Any))
  def tileId(lat: Double, lon: Double, z: Int): Long = Tile.tileId(lat, lon, z)
  def tileX(lon: Double, z: Int): Long = Tile.tileX(lon, z)
  def tileY(lat: Double, z: Int): Long = Tile.tileY(lat, z)
  def tileZoom(id: Long): Int = Tile.zoom(id)
  def tileParent(id: Long, z: Int): Long = Tile.parent(id, z)

  /** Tile id -> lon/lat bounds struct (west, south, east, north). */
  def tileBounds(id: Long): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val (w, s, e, n) = Tile.bounds(id)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](w, s, e, n))
  }

  /** Tile id -> WKB box polygon — the raster->vector direction. */
  def tilePolygon(id: Long): Array[Byte] = {
    val (w, s, e, n) = Tile.bounds(id)
    graft.geom.GeomKernel.stMakeBox(w, s, e, n)
  }
}
