package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/**
 * Real audio decode on the JDK's own codec (javax.sound.sampled reads WAV and
 * AIFF PCM) — no external libraries, mirroring ImageKernel for the image
 * modality. StaticInvoke targets, so synth / decode / stats run inside
 * whole-stage codegen like every other kernel. Video remains the one stubbed
 * modality (the JDK genuinely ships no video codec).
 */
object AudioKernel {

  /** Deterministic 16-bit PCM mono WAV: a period-2 square wave alternating
   *  +amp/-amp, written through the JDK's own WAV encoder so the decode path
   *  exercises a real container parse. The sample count is forced even, which
   *  makes the stats exact: mean 0, RMS and peak exactly |amp|. */
  def wavSquare(sampleRate: Int, nSamples: Int, amp: Int): Array[Byte] = {
    val n = math.max(2, nSamples & ~1)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = if ((i & 1) == 0) amp else -amp
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode WAV/AIFF 16-bit PCM via javax.sound.sampled and compute
   *  sample_rate, channels, n_frames, mean, rms, peak over all samples.
   *  NULL for bytes no JDK reader accepts (or non-16-bit payloads). */
  def audioStats(bytes: Array[Byte]): GenericInternalRow = {
    if (bytes == null || bytes.length == 0) return null
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (ais == null) return null
    try {
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
        fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) return null
      val channels = fmt.getChannels
      val data = ais.readAllBytes()
      val total = data.length / 2
      if (total == 0 || channels <= 0) return null
      var sum = 0.0; var sum2 = 0.0; var peak = 0L
      var i = 0
      while (i < total) {
        val v: Long =
          if (fmt.isBigEndian) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort.toLong
          else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toLong
        sum += v; sum2 += (v * v).toDouble
        if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      new GenericInternalRow(Array[Any](
        fmt.getSampleRate.toInt, channels, (total / channels).toLong,
        sum / total, math.sqrt(sum2 / total), peak.toInt))
    } catch {
      case _: Exception => null
    } finally {
      try ais.close() catch { case _: Exception => () }
    }
  }
}

/** Real audio `MediaCodec` (WAV/AIFF PCM): 6 features — sample rate,
 *  channels, frame count, mean, RMS, peak. None for undecodable bytes. */
object WavCodec extends Multimodal.MediaCodec {
  val featureDim = 6

  def decode(media: Array[Byte], meta: Multimodal.MediaMeta): Option[Array[Float]] = {
    val row = AudioKernel.audioStats(media)
    if (row == null) None
    else Some(Array(
      row.getInt(0).toFloat, row.getInt(1).toFloat, row.getLong(2).toFloat,
      row.getDouble(3).toFloat, row.getDouble(4).toFloat, row.getInt(5).toFloat))
  }
}
