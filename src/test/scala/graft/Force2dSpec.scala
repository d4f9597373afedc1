package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.functions.st._
import graft.geom.GeomKernel

/**
 * `st_force2d` / `read_file(force_2d=True)` — reference io/file.py:57-59:
 * "If the geometry has Z values, setting this to True will cause those to be
 * ignored and 2D geometries to be returned." Inputs cover both Z/M encodings
 * JTS accepts (ISO +1000/+2000/+3000 type offsets, EWKB flag bits) and both
 * byte orders; output is always the engine's canonical XY little-endian WKB.
 */
class Force2dSpec extends SparkSpec {

  private def le(parts: Any*): Array[Byte] = {
    val buf = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    parts.foreach {
      case b: Byte => buf.put(b)
      case i: Int => buf.putInt(i)
      case d: Double => buf.putDouble(d)
      case other => fail(s"bad part $other")
    }
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  private val xy = GeomKernel.stPoint(3.5, -7.25)

  test("ISO Z point (type 1001) drops Z") {
    val z = le(1.toByte, 1001, 3.5, -7.25, 99.0)
    assert(GeomKernel.stForce2d(z).toSeq == xy.toSeq)
  }

  test("ISO ZM point (type 3001) drops Z and M") {
    val zm = le(1.toByte, 3001, 3.5, -7.25, 99.0, -1.0)
    assert(GeomKernel.stForce2d(zm).toSeq == xy.toSeq)
  }

  test("EWKB Z flag point drops Z") {
    val z = le(1.toByte, 0x80000001, 3.5, -7.25, 99.0)
    assert(GeomKernel.stForce2d(z).toSeq == xy.toSeq)
  }

  test("big-endian ISO Z point normalizes to canonical LE XY") {
    val buf = ByteBuffer.allocate(34).order(ByteOrder.BIG_ENDIAN)
    buf.put(0.toByte).putInt(1001).putDouble(3.5).putDouble(-7.25).putDouble(99.0)
    assert(GeomKernel.stForce2d(buf.array()).toSeq == xy.toSeq)
  }

  test("ISO Z LineString (type 1002) drops Z on every vertex") {
    val z = le(1.toByte, 1002, 2, 0.0, 1.0, 50.0, 2.0, 3.0, 60.0)
    val flat = GeomKernel.stMakeLine(0.0, 1.0, 2.0, 3.0)
    assert(GeomKernel.stForce2d(z).toSeq == flat.toSeq)
  }

  test("canonical 2D input round-trips byte-identically") {
    assert(GeomKernel.stForce2d(xy).toSeq == xy.toSeq)
    val box = GeomKernel.stMakeBox(0, 0, 4, 2)
    assert(GeomKernel.stForce2d(box).toSeq == box.toSeq)
  }

  test("st_force2d column: area/length unchanged by Z removal (codegen path)") {
    val rows = (0 until 8).map { i =>
      (i.toLong, le(1.toByte, 1002, 2, i.toDouble, 0.0, 123.0, i + 3.0, 4.0, -5.0))
    }
    val df = spark.createDataFrame(rows).toDF("id", "geometry")
      .select(col("id"),
        st_length(st_force2d(col("geometry"))).as("len"),
        st_geomType(st_force2d(col("geometry"))).as("t"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) == 5.0) // 3-4-5 triangle hypotenuse
      assert(r.getInt(2) == GeomKernel.LINESTRING)
    }
  }

  test("readFile(force2d) re-encodes the geometry column; fid path composes") {
    val dir = java.nio.file.Files.createTempDirectory("force2d").toString
    val rows = (0 until 10).map { i =>
      (i.toLong, le(1.toByte, 1001, i.toDouble, 2.0 * i, 77.0))
    }
    spark.createDataFrame(rows).toDF("fid", "geometry")
      .write.mode("overwrite").parquet(dir)
    val got = graft.sources.CellStore.readFile(spark, dir, force2d = true)
      .select(col("fid"), st_x(col("geometry")).as("x"), length(col("geometry")).as("nb"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 10L))
    got.foreach { case (fid, x, nb) =>
      assert(x == fid.toDouble)
      assert(nb == 21) // canonical XY point WKB: 1 + 4 + 16
    }
    // force2d composes with fids selection
    val sel = graft.sources.CellStore.readFile(spark, dir, force2d = true,
      fids = Some(Seq(3L, 5L))).select("fid").collect().map(_.getLong(0)).sorted
    assert(sel.toSeq == Seq(3L, 5L))
  }
}
