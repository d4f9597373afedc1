package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/**
 * Real image decode on the JDK's own codecs (javax.imageio: PNG, BMP, GIF,
 * JPEG) — no external libraries. StaticInvoke targets, so encode / decode /
 * resize run inside whole-stage codegen like every other kernel.
 *
 * This replaces the round-1 stub for the image modality; audio/video decode
 * remains stubbed behind `Multimodal.MediaCodec` (the JDK ships no codec).
 */
object ImageKernel {

  /** Deterministic solid-color PNG — the synthetic generator for tests and
   *  gate queries (constant fill makes channel means exactly predictable). */
  def pngConst(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def read(bytes: Array[Byte]): BufferedImage =
    if (bytes == null || bytes.length == 0) null
    else try ImageIO.read(new ByteArrayInputStream(bytes)) catch { case _: Exception => null }

  /** width, height, per-channel means — NULL for undecodable bytes. */
  def imgStats(bytes: Array[Byte]): GenericInternalRow = {
    val img = read(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    new GenericInternalRow(Array[Any](w, h, sr / n, sg / n, sb / n))
  }

  /** Nearest-neighbour resize, re-encoded as PNG — NULL if undecodable. */
  def imgResize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val img = read(bytes)
    if (img == null || width <= 0 || height <= 0) return null
    val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      val sy = (y.toLong * img.getHeight / height).toInt
      var x = 0
      while (x < width) {
        val sx = (x.toLong * img.getWidth / width).toInt
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }
}

/** Real image `MediaCodec`: 8 features — width, height, aspect, channel
 *  means, luma mean/stddev. None for bytes no JDK reader accepts. */
object ImageIoCodec extends Multimodal.MediaCodec {
  val featureDim = 8

  def decode(media: Array[Byte], meta: Multimodal.MediaMeta): Option[Array[Float]] = {
    if (media == null || media.isEmpty) return None
    val img =
      try ImageIO.read(new ByteArrayInputStream(media)) catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    val meanL = sl / n
    Some(Array(w.toFloat, h.toFloat, (w.toDouble / h).toFloat,
      (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      meanL.toFloat, math.sqrt(math.max(0, sl2 / n - meanL * meanL)).toFloat))
  }
}
