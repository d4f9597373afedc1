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
}
