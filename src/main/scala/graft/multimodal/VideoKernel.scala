package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/**
 * REAL video decode with zero external dependencies: a standard AVI (RIFF)
 * container holding uncompressed 24-bit DIB frames (stream handler 'DIB ',
 * BI_RGB) — the bit-exact uncompressed-video format every AVI tool reads.
 * The JDK ships no compressed-video codec, but a RIFF walker + raw DIB
 * frames need none; this replaces round-3's FakeCodec stub, completing the
 * third real modality next to javax.imageio (image) and javax.sound.sampled
 * (audio).
 *
 * Layout written/parsed (all little-endian):
 *   RIFF('AVI ') { LIST('hdrl'){ avih, LIST('strl'){ strh('vids','DIB '),
 *   strf(BITMAPINFOHEADER bi24) } }, LIST('movi'){ '00db' frame ... } }
 * Frames are bottom-up rows of BGR triples, rows padded to 4 bytes — the
 * DIB contract. The decoder walks chunks generically (skips unknown ones,
 * honors the RIFF even-byte padding rule) and accepts both '00db'
 * (uncompressed) and '00dc' frame ids.
 */
object VideoKernel {

  // ---------- encode (deterministic gate/test source) ----------

  private def fourcc(b: ByteBuffer, s: String): Unit = {
    var i = 0; while (i < 4) { b.put(s.charAt(i).toByte); i += 1 }
  }

  private def rowBytes(w: Int): Int = ((w * 3 + 3) / 4) * 4
  private def frameBytes(w: Int, h: Int): Int = rowBytes(w) * h

  /**
   * Solid-colour gradient clip: frame i is the single colour
   * (r0+i*step, g0+i*step, b0+i*step) — caller keeps values inside 0..255
   * so every per-frame and whole-clip statistic has a closed form.
   */
  def aviGradient(w: Int, h: Int, nFrames: Int, fps: Int,
                  r0: Int, g0: Int, b0: Int, step: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0 && fps > 0, "bad avi dimensions")
    require(r0 + step * (nFrames - 1) <= 255 && g0 + step * (nFrames - 1) <= 255 &&
      b0 + step * (nFrames - 1) <= 255 && r0.min(g0).min(b0) >= 0 && step >= 0,
      "gradient must stay inside 0..255")
    val fb = frameBytes(w, h)
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + nFrames * (8 + fb)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)

    fourcc(buf, "RIFF"); buf.putInt(riffSize); fourcc(buf, "AVI ")
    // hdrl
    fourcc(buf, "LIST"); buf.putInt(hdrlSize); fourcc(buf, "hdrl")
    fourcc(buf, "avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
    buf.putInt(fb * fps)      // dwMaxBytesPerSec
    buf.putInt(0)             // dwPaddingGranularity
    buf.putInt(0)             // dwFlags
    buf.putInt(nFrames); buf.putInt(0) // total/initial frames
    buf.putInt(1)             // dwStreams
    buf.putInt(fb)            // dwSuggestedBufferSize
    buf.putInt(w); buf.putInt(h)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // reserved
    // strl
    fourcc(buf, "LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); fourcc(buf, "strl")
    fourcc(buf, "strh"); buf.putInt(56)
    fourcc(buf, "vids"); fourcc(buf, "DIB ")
    buf.putInt(0)             // dwFlags
    buf.putShort(0); buf.putShort(0) // priority, language
    buf.putInt(0)             // dwInitialFrames
    buf.putInt(1); buf.putInt(fps) // scale, rate -> rate/scale fps
    buf.putInt(0); buf.putInt(nFrames) // start, length (frames)
    buf.putInt(fb)            // dwSuggestedBufferSize
    buf.putInt(0); buf.putInt(0) // quality, sampleSize
    buf.putShort(0); buf.putShort(0) // rcFrame left, top
    buf.putShort(w.toShort); buf.putShort(h.toShort)
    fourcc(buf, "strf"); buf.putInt(40)
    buf.putInt(40); buf.putInt(w); buf.putInt(h)
    buf.putShort(1); buf.putShort(24) // planes, bitcount
    buf.putInt(0)             // BI_RGB
    buf.putInt(fb)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    // movi
    fourcc(buf, "LIST"); buf.putInt(moviSize); fourcc(buf, "movi")
    val rb = rowBytes(w)
    var i = 0
    while (i < nFrames) {
      fourcc(buf, "00db"); buf.putInt(fb)
      val bB = (b0 + i * step).toByte
      val gB = (g0 + i * step).toByte
      val rB = (r0 + i * step).toByte
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { buf.put(bB); buf.put(gB); buf.put(rB); x += 1 }
        var p = w * 3
        while (p < rb) { buf.put(0.toByte); p += 1 }
        y += 1
      }
      i += 1
    }
    buf.array()
  }

  // ---------- decode ----------

  private final case class Clip(width: Int, height: Int, usPerFrame: Int,
                                frames: Array[Int] /* offsets into bytes */,
                                bytes: Array[Byte])

  /** RIFF walk; null for anything that is not a well-formed DIB AVI. */
  private def parse(bytes: Array[Byte]): Clip = {
    if (bytes == null || bytes.length < 24) return null
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return null
    val end = math.min(bytes.length.toLong, 8L + b.getInt(4))
    var width = 0; var height = 0; var usPerFrame = 0; var bitCount = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Int]

    def walk(from: Long, to: Long, inMovi: Boolean): Boolean = {
      var off = from
      while (off + 8 <= to) {
        val id = fcc(off.toInt)
        val size = b.getInt(off.toInt + 4).toLong & 0xffffffffL
        val body = off + 8
        if (body + size > to) return false // truncated chunk
        if (id == "LIST") {
          if (size < 4) return false
          val listType = fcc(body.toInt)
          if (!walk(body + 4, body + size,
            inMovi || listType == "movi")) return false
        } else if (id == "avih") {
          if (size < 40) return false
          usPerFrame = b.getInt(body.toInt)
          width = b.getInt(body.toInt + 32)
          height = b.getInt(body.toInt + 36)
        } else if (id == "strf") {
          if (size >= 16) bitCount = b.getShort(body.toInt + 14).toInt
        } else if (inMovi && id.length == 4 &&
          (id.endsWith("db") || id.endsWith("dc"))) {
          frames += body.toInt
        }
        off = body + size + (size & 1) // RIFF pads chunks to even byte counts
      }
      true
    }
    if (!walk(12, end, inMovi = false)) return null
    if (width <= 0 || height <= 0 || bitCount != 24 || frames.isEmpty) return null
    // every frame must hold a full DIB raster
    val fb = frameBytes(width, height)
    var i = 0
    while (i < frames.length) {
      if (frames(i) + fb > bytes.length) return null
      i += 1
    }
    Clip(width, height, usPerFrame, frames.toArray, bytes)
  }

  private def frameSums(c: Clip, frame: Int): (Long, Long, Long) = {
    val rb = rowBytes(c.width)
    var sr = 0L; var sg = 0L; var sb = 0L
    val base = c.frames(frame)
    var y = 0
    while (y < c.height) {
      var p = base + y * rb
      var x = 0
      while (x < c.width) {
        sb += c.bytes(p) & 0xff
        sg += c.bytes(p + 1) & 0xff
        sr += c.bytes(p + 2) & 0xff
        p += 3; x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** Whole-clip stats: dims, frame count, fps, per-channel means over every
   *  pixel of every frame. NULL for non-AVI/garbage bytes. */
  def videoStats(bytes: Array[Byte]): GenericInternalRow = {
    val c = parse(bytes)
    if (c == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < c.frames.length) {
      val (r, g, b) = frameSums(c, i); sr += r; sg += g; sb += b; i += 1
    }
    val px = c.frames.length.toLong * c.width * c.height
    val fps = if (c.usPerFrame > 0) 1000000 / c.usPerFrame else 0
    new GenericInternalRow(Array[Any](c.width, c.height, c.frames.length, fps,
      sr.toDouble / px, sg.toDouble / px, sb.toDouble / px))
  }

  /** Frame-sample stats: per-channel means of one frame (0-based).
   *  NULL if undecodable or the index is out of range. */
  def videoFrameStats(bytes: Array[Byte], frame: Int): GenericInternalRow = {
    val c = parse(bytes)
    if (c == null || frame < 0 || frame >= c.frames.length) return null
    val (sr, sg, sb) = frameSums(c, frame)
    val px = c.width.toLong * c.height
    new GenericInternalRow(Array[Any](
      sr.toDouble / px, sg.toDouble / px, sb.toDouble / px))
  }

  /** Frame-sample to image: re-encode one frame as PNG (lossless), composing
   *  with the javax.imageio pipeline (img_stats / img_resize). NULL if
   *  undecodable or out of range. */
  def videoFramePng(bytes: Array[Byte], frame: Int): Array[Byte] = {
    val c = parse(bytes)
    if (c == null || frame < 0 || frame >= c.frames.length) return null
    val img = new java.awt.image.BufferedImage(
      c.width, c.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rb = rowBytes(c.width)
    val base = c.frames(frame)
    var y = 0
    while (y < c.height) {
      var p = base + (c.height - 1 - y) * rb // DIB rows are bottom-up
      var x = 0
      while (x < c.width) {
        val bl = c.bytes(p) & 0xff; val g = c.bytes(p + 1) & 0xff
        val r = c.bytes(p + 2) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | bl)
        p += 3; x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}

/** Batched-codec face of the AVI/DIB decoder — the MediaCodec the round-3
 *  FakeCodec stub promised: [w, h, nFrames, fps, mean_r, mean_g, mean_b,
 *  duration_s]. */
object AviDibCodec extends Multimodal.MediaCodec {
  val featureDim = 8

  def decode(media: Array[Byte], meta: Multimodal.MediaMeta): Option[Array[Float]] = {
    val row = VideoKernel.videoStats(media)
    if (row == null) return None
    val n = row.getInt(2); val fps = row.getInt(3)
    Some(Array[Float](
      row.getInt(0).toFloat, row.getInt(1).toFloat, n.toFloat, fps.toFloat,
      row.getDouble(4).toFloat, row.getDouble(5).toFloat, row.getDouble(6).toFloat,
      if (fps > 0) n.toFloat / fps else 0f))
  }
}
