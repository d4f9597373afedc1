package graft

import org.apache.spark.sql.functions._

import graft.functions.st._
import graft.multimodal.{ImageIoCodec, ImageKernel, Multimodal}

/** Real image decode (javax.imageio) — kernel + codec + pipeline plumbing. */
class ImageSpec extends SparkSpec {

  test("png_const -> img_stats round-trips dimensions and exact channel means") {
    val png = ImageKernel.pngConst(12, 7, 200, 30, 99)
    val stats = ImageKernel.imgStats(png)
    assert(stats.getInt(0) == 12 && stats.getInt(1) == 7)
    assert(stats.getDouble(2) == 200.0 && stats.getDouble(3) == 30.0 &&
      stats.getDouble(4) == 99.0)
  }

  test("img_resize: target dims, constant colour preserved, garbage -> null") {
    val png = ImageKernel.pngConst(16, 16, 10, 20, 30)
    val small = ImageKernel.imgResize(png, 4, 5)
    val stats = ImageKernel.imgStats(small)
    assert(stats.getInt(0) == 4 && stats.getInt(1) == 5)
    assert(stats.getDouble(2) == 10.0)
    assert(ImageKernel.imgStats(Array[Byte](1, 2, 3)) == null)
    assert(ImageKernel.imgResize(Array[Byte](1, 2, 3), 4, 4) == null)
  }

  test("ImageIoCodec decodes real PNGs through the batched pipeline; garbage is corrupt") {
    import spark.implicits._
    val rows = (0L until 20L).map { i =>
      val bytes =
        if (i % 5 == 4) Array[Byte](9, 9, 9) // undecodable
        else ImageKernel.pngConst(8 + i.toInt, 8, (i * 11 % 256).toInt, 0, 0)
      Multimodal.MediaRow(i, bytes, Multimodal.MediaMeta("image", 0, 0, 0, 0))
    }
    val ds = spark.createDataset(rows)
    val feats = Multimodal.extractFeatures(ds, ImageIoCodec).collect().sortBy(_.doc_id)
    assert(feats.count(!_.decodeOk) == 4)
    feats.filter(_.decodeOk).foreach { f =>
      assert(f.featureDim == 8 && f.features.length == 8)
      assert(f.features(0) == 8f + f.doc_id && f.features(1) == 8f)
      assert(f.features(3) == (f.doc_id * 11 % 256).toFloat) // mean R
    }
  }

  test("column DSL: img_stats inside codegen over a DataFrame") {
    import spark.implicits._
    val df = (1L to 50L).toDF("id")
      .withColumn("png", png_const(lit(6) + (col("id") % 4).cast("int"), lit(6),
        (col("id") % 256).cast("int"), lit(0), lit(0)))
      .select(col("id"), img_stats(col("png")).as("s"))
      .select(col("id"), col("s.width").as("w"), col("s.mean_r").as("r"))
    df.collect().foreach { row =>
      val id = row.getLong(0)
      assert(row.getInt(1) == 6 + (id % 4).toInt)
      assert(row.getDouble(2) == (id % 256).toDouble)
    }
  }
}
