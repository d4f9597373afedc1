package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AudioKernel, Multimodal, WavCodec}

/** Real JDK audio decode (javax.sound.sampled, WAV PCM): the square-wave
 *  synth makes every stat exact — mean 0, RMS == peak == amplitude. */
class AudioSpec extends SparkSpec {

  test("wavSquare -> audioStats round trip is exact") {
    for ((sr, n, amp) <- Seq((8000, 400, 1000), (16000, 654, 1), (44100, 512, 1999),
      (12000, 401, 0))) {
      val row = AudioKernel.audioStats(AudioKernel.wavSquare(sr, n, amp))
      assert(row != null, s"decode failed sr=$sr n=$n amp=$amp")
      assert(row.getInt(0) == sr)
      assert(row.getInt(1) == 1)
      assert(row.getLong(2) == math.max(2, n & ~1).toLong)
      assert(row.getDouble(3) == 0.0, s"mean ${row.getDouble(3)}")
      assert(row.getDouble(4) == amp.toDouble, s"rms ${row.getDouble(4)}")
      assert(row.getInt(5) == amp)
    }
  }

  test("garbage and empty bytes decode to NULL, not an exception") {
    assert(AudioKernel.audioStats(null) == null)
    assert(AudioKernel.audioStats(Array.empty[Byte]) == null)
    assert(AudioKernel.audioStats(Array.tabulate(256)(i => (i * 7).toByte)) == null)
    // a valid RIFF header with a truncated body must not throw either
    val wav = AudioKernel.wavSquare(8000, 100, 5)
    assert(AudioKernel.audioStats(wav.take(30)) == null)
  }

  test("WavCodec decodes real WAVs through the batched pipeline; garbage is corrupt") {
    import spark.implicits._
    val rows = (0L until 24L).map { id =>
      val media =
        if (id % 4 == 3) Array.tabulate(64)(i => ((id * 31 + i) & 0xff).toByte)
        else AudioKernel.wavSquare(8000 + (id % 3).toInt * 4000, 400 + id.toInt * 2, 100 + id.toInt)
      Multimodal.MediaRow(id, media,
        Multimodal.MediaMeta("audio", 0, 0, 8000 + (id % 3).toInt * 4000, 1000))
    }
    val feats = Multimodal.extractFeatures(rows.toDS(), WavCodec).collect().sortBy(_.doc_id)
    assert(feats.length == 24)
    feats.foreach { f =>
      if (f.doc_id % 4 == 3) assert(!f.decodeOk, s"garbage decoded: ${f.doc_id}")
      else {
        assert(f.decodeOk && f.features.length == WavCodec.featureDim)
        assert(f.features(0) == (8000 + (f.doc_id % 3) * 4000).toFloat) // sample rate
        assert(f.features(4) == (100 + f.doc_id).toFloat) // rms == amplitude
      }
    }
  }
}
