package graft

import org.apache.spark.sql.functions._

import graft.functions.st._
import graft.multimodal.{AviDibCodec, Multimodal, VideoKernel}

/** Real AVI/DIB video codec: RIFF structure, exact decode stats, frame
 *  sampling (direct + via lossless PNG re-encode), corrupt handling. */
class VideoSpec extends SparkSpec {

  test("aviGradient writes a well-formed RIFF AVI; videoStats decodes it exactly") {
    val avi = VideoKernel.aviGradient(16, 10, 4, 10, 20, 40, 60, 5)
    // container magic
    assert(new String(avi, 0, 4) == "RIFF" && new String(avi, 8, 4) == "AVI ")
    val s = VideoKernel.videoStats(avi)
    assert(s.getInt(0) == 16 && s.getInt(1) == 10) // dims
    assert(s.getInt(2) == 4 && s.getInt(3) == 10)  // frames, fps
    // solid gradient: mean = base + step*(n-1)/2, exact
    assert(s.getDouble(4) == 20 + 5 * 1.5)
    assert(s.getDouble(5) == 40 + 5 * 1.5)
    assert(s.getDouble(6) == 60 + 5 * 1.5)
  }

  test("frame sampling: per-frame stats and PNG re-encode agree exactly") {
    val avi = VideoKernel.aviGradient(12, 8, 5, 5, 10, 30, 50, 7)
    for (i <- 0 until 5) {
      val f = VideoKernel.videoFrameStats(avi, i)
      assert(f.getDouble(0) == 10 + 7 * i)
      assert(f.getDouble(1) == 30 + 7 * i)
      assert(f.getDouble(2) == 50 + 7 * i)
      // lossless PNG path through javax.imageio gives the same channel means
      val png = VideoKernel.videoFramePng(avi, i)
      val is = graft.multimodal.ImageKernel.imgStats(png)
      assert(is.getInt(0) == 12 && is.getInt(1) == 8)
      assert(is.getDouble(2) == 10 + 7 * i && is.getDouble(3) == 30 + 7 * i &&
        is.getDouble(4) == 50 + 7 * i)
    }
    assert(VideoKernel.videoFrameStats(avi, 5) == null) // out of range
    assert(VideoKernel.videoFrameStats(avi, -1) == null)
  }

  test("row padding: widths not divisible by 4 round-trip (DIB 4-byte rows)") {
    for (w <- Seq(7, 9, 10, 13)) {
      val avi = VideoKernel.aviGradient(w, 3, 2, 8, 100, 110, 120, 3)
      val s = VideoKernel.videoStats(avi)
      assert(s.getInt(0) == w && s.getDouble(4) == 100 + 1.5)
    }
  }

  test("garbage, truncation, and wrong containers are NULL, never a crash") {
    assert(VideoKernel.videoStats(null) == null)
    assert(VideoKernel.videoStats(Array.empty[Byte]) == null)
    assert(VideoKernel.videoStats("not a riff file at all".getBytes) == null)
    val avi = VideoKernel.aviGradient(8, 8, 3, 10, 1, 2, 3, 0)
    // truncate mid-frame: the frame raster check must reject it
    assert(VideoKernel.videoStats(java.util.Arrays.copyOf(avi, avi.length - 50)) == null)
    // a valid RIFF that is not an AVI (WAV) is rejected by the magic check
    val wav = graft.multimodal.AudioKernel.wavSquare(8000, 64, 1000)
    assert(VideoKernel.videoStats(wav) == null)
    // and a PNG is not RIFF at all
    assert(VideoKernel.videoStats(graft.multimodal.ImageKernel.pngConst(4, 4, 1, 2, 3)) == null)
  }

  test("fuzz: random corruptions/truncations of valid AVIs never throw") {
    // a 100-TB media column WILL contain malformed bytes; the parser's
    // contract is NULL, never an executor-killing exception
    val rnd = new scala.util.Random(1234)
    val valid = VideoKernel.aviGradient(10, 6, 3, 10, 50, 60, 70, 4)
    for (_ <- 0 until 300) {
      val mode = rnd.nextInt(3)
      val bytes = mode match {
        case 0 => // random truncation
          java.util.Arrays.copyOf(valid, rnd.nextInt(valid.length + 1))
        case 1 => // random byte flips (1-8 positions)
          val b = valid.clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          b
        case _ => // pure noise of random length
          val b = new Array[Byte](rnd.nextInt(4096)); rnd.nextBytes(b); b
      }
      // must return a row or null — any exception fails the test
      val s = VideoKernel.videoStats(bytes)
      if (s != null) { // a surviving parse must still be self-consistent
        assert(s.getInt(0) > 0 && s.getInt(1) > 0 && s.getInt(2) > 0)
      }
      VideoKernel.videoFrameStats(bytes, rnd.nextInt(5) - 1)
      VideoKernel.videoFramePng(bytes, 0)
    }
  }

  test("MJPEG: aviMjpeg clips decode via the ImageIO JPEG path (r5)") {
    val avi = VideoKernel.aviMjpeg(32, 24, 4, 8, 20, 40, 60, 5)
    assert(new String(avi, 0, 4) == "RIFF" && new String(avi, 8, 4) == "AVI ")
    assert(VideoKernel.videoCodec(avi) == 1)           // MJPEG
    assert(VideoKernel.videoCodec(
      VideoKernel.aviGradient(8, 8, 1, 5, 1, 2, 3, 0)) == 0) // DIB
    val s = VideoKernel.videoStats(avi)
    // structure is exact even though pixels are lossy
    assert(s.getInt(0) == 32 && s.getInt(1) == 24 && s.getInt(2) == 4 && s.getInt(3) == 8)
    // solid-colour JPEG round-trips within DC-quantization error (few levels)
    assert(math.abs(s.getDouble(4) - (20 + 5 * 1.5)) < 3.0, s"mean_r=${s.getDouble(4)}")
    assert(math.abs(s.getDouble(5) - (40 + 5 * 1.5)) < 3.0)
    assert(math.abs(s.getDouble(6) - (60 + 5 * 1.5)) < 3.0)
    // per-frame sampling + PNG composition
    for (i <- Seq(0, 3)) {
      val f = VideoKernel.videoFrameStats(avi, i)
      assert(math.abs(f.getDouble(0) - (20 + 5 * i)) < 3.0)
      val png = VideoKernel.videoFramePng(avi, i)
      assert(png != null && (png(1) & 0xff) == 0x50) // 'P' of PNG magic
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 32 && img.getHeight == 24)
    }
    assert(VideoKernel.videoFrameStats(avi, 4) == null) // out of range
    // corrupt ONE frame's JPEG body: whole-clip stats refuse (no silent skew)
    val broken = avi.clone()
    val soi = {
      // find the second '00dc' chunk and stomp its SOI marker
      var i = 12; var found = 0; var at = -1
      while (i < broken.length - 4 && at < 0) {
        if (broken(i) == '0' && broken(i + 1) == '0' && broken(i + 2) == 'd' &&
          broken(i + 3) == 'c') { found += 1; if (found == 2) at = i + 8 }
        i += 1
      }
      at
    }
    assert(soi > 0)
    broken(soi) = 0x00
    assert(VideoKernel.videoStats(broken) == null)
    // codec dispatch: the batched pipeline decodes MJPEG rows too
    import spark.implicits._
    val rows = Seq(Multimodal.MediaRow(1L, avi,
      Multimodal.MediaMeta("video", 32, 24, 0, 500L))).toDS()
    val feats = Multimodal.extractFeatures(rows, AviDibCodec).collect()
    assert(feats.length == 1 && feats(0).decodeOk && feats(0).features(2) == 4f)
  }

  test("MJPEG DSL: avi_mjpeg/video_codec/video_stats inside codegen (r5)") {
    import spark.implicits._
    val df = Seq((1, 10, 20, 30), (2, 40, 50, 60)).toDF("id", "r", "g", "b")
      .withColumn("avi", avi_mjpeg(lit(24), lit(16), lit(3), lit(6),
        col("r"), col("g"), col("b"), lit(4)))
      .select(col("id"), video_codec(col("avi")).as("codec"),
        video_stats(col("avi")).as("vs"), col("r"))
      .select(col("id"), col("codec"), col("vs.n_frames"), col("vs.fps"),
        col("vs.mean_r"), col("r"))
    val rows = df.collect().sortBy(_.getInt(0))
    rows.foreach { row =>
      assert(row.getInt(1) == 1 && row.getInt(2) == 3 && row.getInt(3) == 6)
      assert(math.abs(row.getDouble(4) - (row.getInt(5) + 4)) < 3.0)
    }
  }

  test("AviDibCodec through the batched multimodal pipeline") {
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      Multimodal.MediaRow(i.toLong,
        VideoKernel.aviGradient(8 + i % 5, 8, 1 + i % 4, 5 + i % 6, i, i * 2 % 100, 3, 1),
        Multimodal.MediaMeta("video", 8 + i % 5, 8, 0, 1000))
    }
    val feats = Multimodal.extractFeatures(rows.toDS(), AviDibCodec).collect()
    assert(feats.length == 20 && feats.forall(_.decodeOk))
    feats.foreach { f =>
      val i = f.doc_id.toInt
      assert(f.features(0) == (8 + i % 5).toFloat)
      assert(f.features(2) == (1 + i % 4).toFloat)
      assert(f.features(3) == (5 + i % 6).toFloat)
    }
  }

  test("DSL: avi_gradient/video_stats/video_frame_png inside codegen") {
    import spark.implicits._
    val df = (1 to 50).toDF("k").select(
      col("k"),
      avi_gradient(lit(8) + col("k") % 3, lit(8), lit(1) + col("k") % 4,
        lit(10), col("k") % 100, lit(5), lit(9), lit(2)).as("avi"))
    val out = df.select(col("k"),
      video_stats(col("avi")).getField("n_frames").as("n"),
      video_stats(col("avi")).getField("mean_g").as("mg"),
      img_stats(video_frame_png(col("avi"), lit(0))).getField("mean_b").as("pb"))
      .collect()
    out.foreach { r =>
      val k = r.getInt(0)
      assert(r.getInt(1) == 1 + k % 4)
      assert(r.getDouble(2) == 5 + 2 * ((1 + k % 4) - 1) / 2.0)
      assert(r.getDouble(3) == 9.0)
    }
  }
}
