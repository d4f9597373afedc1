package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/**
 * REAL video decode with zero external dependencies: a standard AVI (RIFF)
 * container holding either uncompressed 24-bit DIB frames (stream handler
 * 'DIB ', BI_RGB — bit-exact) or Motion-JPEG frames ('MJPG', r5 — each
 * '00dc' chunk is a complete JPEG routed through the JDK's javax.imageio
 * JPEG reader, the same decoder the image modality uses). This replaces
 * round-3's FakeCodec stub, completing the third real modality next to
 * javax.imageio (image) and javax.sound.sampled (audio).
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

  /**
   * MJPEG gradient clip: same solid-colour gradient contract as
   * [[aviGradient]], but each frame is a complete JPEG (javax.imageio
   * writer) in a '00dc' chunk, stream handler 'MJPG' and biCompression
   * 'MJPG' — the standard Motion-JPEG-in-AVI layout. JPEG is lossy, so
   * decoded means carry DC-quantization error of a few levels; gates assert
   * tolerance bands, not exact values.
   */
  def aviMjpeg(w: Int, h: Int, nFrames: Int, fps: Int,
               r0: Int, g0: Int, b0: Int, step: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0 && fps > 0, "bad avi dimensions")
    require(r0 + step * (nFrames - 1) <= 255 && g0 + step * (nFrames - 1) <= 255 &&
      b0 + step * (nFrames - 1) <= 255 && r0.min(g0).min(b0) >= 0 && step >= 0,
      "gradient must stay inside 0..255")
    val jpegs: Array[Array[Byte]] = (0 until nFrames).map { i =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = ((r0 + i * step) << 16) | ((g0 + i * step) << 8) | (b0 + i * step)
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }.toArray
    val maxFb = jpegs.map(_.length).max
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)

    fourcc(buf, "RIFF"); buf.putInt(riffSize); fourcc(buf, "AVI ")
    fourcc(buf, "LIST"); buf.putInt(hdrlSize); fourcc(buf, "hdrl")
    fourcc(buf, "avih"); buf.putInt(56)
    buf.putInt(1000000 / fps); buf.putInt(maxFb * fps); buf.putInt(0); buf.putInt(0)
    buf.putInt(nFrames); buf.putInt(0)
    buf.putInt(1); buf.putInt(maxFb)
    buf.putInt(w); buf.putInt(h)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    fourcc(buf, "LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); fourcc(buf, "strl")
    fourcc(buf, "strh"); buf.putInt(56)
    fourcc(buf, "vids"); fourcc(buf, "MJPG")
    buf.putInt(0); buf.putShort(0); buf.putShort(0); buf.putInt(0)
    buf.putInt(1); buf.putInt(fps)
    buf.putInt(0); buf.putInt(nFrames)
    buf.putInt(maxFb); buf.putInt(0); buf.putInt(0)
    buf.putShort(0); buf.putShort(0)
    buf.putShort(w.toShort); buf.putShort(h.toShort)
    fourcc(buf, "strf"); buf.putInt(40)
    buf.putInt(40); buf.putInt(w); buf.putInt(h)
    buf.putShort(1); buf.putShort(24)
    buf.putInt(0x47504A4D) // biCompression 'MJPG' (LE)
    buf.putInt(maxFb)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    fourcc(buf, "LIST"); buf.putInt(moviSize); fourcc(buf, "movi")
    jpegs.foreach { j =>
      fourcc(buf, "00dc"); buf.putInt(j.length); buf.put(j)
      if ((j.length & 1) == 1) buf.put(0.toByte) // RIFF even padding
    }
    buf.array()
  }

  // ---------- decode ----------

  private final val CodecDib = 0
  private final val CodecMjpeg = 1

  private final case class Clip(width: Int, height: Int, usPerFrame: Int,
                                codec: Int,
                                frames: Array[Int] /* offsets into bytes */,
                                sizes: Array[Int] /* chunk byte counts */,
                                bytes: Array[Byte])

  /** RIFF walk; null for anything that is not a well-formed DIB or MJPEG
   *  AVI. MJPEG is recognized by the stream handler fourcc 'MJPG' (strh) or
   *  biCompression 'MJPG' (strf); its '00dc' chunks each hold one complete
   *  JPEG image, routed through the SAME javax.imageio path the image
   *  modality uses. */
  private def parse(bytes: Array[Byte]): Clip = {
    if (bytes == null || bytes.length < 24) return null
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return null
    val end = math.min(bytes.length.toLong, 8L + b.getInt(4))
    var width = 0; var height = 0; var usPerFrame = 0; var bitCount = 0
    var handler = ""; var compression = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Int]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]

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
        } else if (id == "strh") {
          if (size >= 8 && fcc(body.toInt) == "vids") handler = fcc(body.toInt + 4)
        } else if (id == "strf") {
          if (size >= 16) bitCount = b.getShort(body.toInt + 14).toInt
          if (size >= 20) compression = b.getInt(body.toInt + 16)
        } else if (inMovi && id.length == 4 &&
          (id.endsWith("db") || id.endsWith("dc"))) {
          frames += body.toInt
          sizes += size.toInt
        }
        off = body + size + (size & 1) // RIFF pads chunks to even byte counts
      }
      true
    }
    if (!walk(12, end, inMovi = false)) return null
    if (width <= 0 || height <= 0 || frames.isEmpty) return null
    val mjpeg = handler == "MJPG" || compression == 0x47504A4D // 'MJPG' LE
    if (mjpeg) {
      // every frame chunk must start with the JPEG SOI marker
      var i = 0
      while (i < frames.length) {
        if (sizes(i) < 4 || (bytes(frames(i)) & 0xff) != 0xff ||
          (bytes(frames(i) + 1) & 0xff) != 0xd8) return null
        i += 1
      }
      return Clip(width, height, usPerFrame, CodecMjpeg,
        frames.toArray, sizes.toArray, bytes)
    }
    if (bitCount != 24) return null
    // every frame must hold a full DIB raster
    val fb = frameBytes(width, height)
    var i = 0
    while (i < frames.length) {
      if (frames(i) + fb > bytes.length) return null
      i += 1
    }
    Clip(width, height, usPerFrame, CodecDib, frames.toArray, sizes.toArray, bytes)
  }

  /** One frame's per-channel sums + pixel count; MJPEG frames decode through
   *  javax.imageio's JPEG reader (the decoded image's own dims count, in
   *  case a stream lies in its header). Corrupt JPEG -> None. */
  private def frameSums(c: Clip, frame: Int): Option[(Long, Long, Long, Long)] = {
    if (c.codec == CodecMjpeg) {
      val img = decodeJpegFrame(c, frame)
      if (img == null) return None
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      return Some((sr, sg, sb, img.getWidth.toLong * img.getHeight))
    }
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
    Some((sr, sg, sb, c.width.toLong * c.height))
  }

  private def decodeJpegFrame(c: Clip, frame: Int): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      c.bytes, c.frames(frame), c.sizes(frame)))
    catch { case _: java.io.IOException => null }

  /** Whole-clip stats: dims, frame count, fps, per-channel means over every
   *  pixel of every frame. NULL for non-AVI/garbage bytes or any corrupt
   *  MJPEG frame. */
  def videoStats(bytes: Array[Byte]): GenericInternalRow = {
    val c = parse(bytes)
    if (c == null) return null
    var sr = 0L; var sg = 0L; var sb = 0L; var px = 0L
    var i = 0
    while (i < c.frames.length) {
      frameSums(c, i) match {
        case Some((r, g, b, p)) => sr += r; sg += g; sb += b; px += p
        case None => return null
      }
      i += 1
    }
    if (px == 0) return null
    val fps = if (c.usPerFrame > 0) 1000000 / c.usPerFrame else 0
    new GenericInternalRow(Array[Any](c.width, c.height, c.frames.length, fps,
      sr.toDouble / px, sg.toDouble / px, sb.toDouble / px))
  }

  /** Whole-clip codec id: 0 = uncompressed DIB, 1 = MJPEG; NULL if not AVI. */
  def videoCodec(bytes: Array[Byte]): java.lang.Integer = {
    val c = parse(bytes)
    if (c == null) null else Int.box(c.codec)
  }

  /** Frame-sample stats: per-channel means of one frame (0-based).
   *  NULL if undecodable or the index is out of range. */
  def videoFrameStats(bytes: Array[Byte], frame: Int): GenericInternalRow = {
    val c = parse(bytes)
    if (c == null || frame < 0 || frame >= c.frames.length) return null
    frameSums(c, frame) match {
      case Some((sr, sg, sb, px)) if px > 0 =>
        new GenericInternalRow(Array[Any](
          sr.toDouble / px, sg.toDouble / px, sb.toDouble / px))
      case _ => null
    }
  }

  /** Frame-sample to image: re-encode one frame as PNG (lossless), composing
   *  with the javax.imageio pipeline (img_stats / img_resize). NULL if
   *  undecodable or out of range. */
  def videoFramePng(bytes: Array[Byte], frame: Int): Array[Byte] = {
    val c = parse(bytes)
    if (c == null || frame < 0 || frame >= c.frames.length) return null
    val img =
      if (c.codec == CodecMjpeg) {
        val decoded = decodeJpegFrame(c, frame)
        if (decoded == null) return null
        decoded
      } else {
        val im = new java.awt.image.BufferedImage(
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
            im.setRGB(x, y, (r << 16) | (g << 8) | bl)
            p += 3; x += 1
          }
          y += 1
        }
        im
      }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}

/** Batched-codec face of the AVI decoder (DIB and MJPEG streams) — the
 *  MediaCodec the round-3 FakeCodec stub promised: [w, h, nFrames, fps,
 *  mean_r, mean_g, mean_b, duration_s]. */
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
