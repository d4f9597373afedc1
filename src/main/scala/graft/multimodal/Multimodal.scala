package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns for a training-data pipeline: media (image/audio/video)
 * travels as an opaque `binary` column plus a typed metadata struct; decode /
 * feature-extraction runs partition-batched so a real codec (JNI or a
 * vectorized library) can amortize per-batch setup.
 *
 * Image decode is REAL (`ImageIoCodec` / `ImageKernel` on javax.imageio:
 * PNG/BMP/GIF/JPEG) and so is audio decode (`WavCodec` / `AudioKernel` on
 * javax.sound.sampled: WAV/AIFF PCM). Video is the one modality the JDK
 * ships no codec for, so it stays a STUB (`FakeCodec`, deterministic
 * pseudo-features); the plumbing — schema, batch shape, partitioning,
 * null-safety — is identical either way, and swapping in a true codec is a
 * one-object change behind the `MediaCodec` interface.
 */
object Multimodal {

  /** Typed metadata carried alongside the payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, sampleRateHz: Int,
                       durationMs: Long)

  case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(doc_id: Long, kind: String, featureDim: Int,
                           features: Array[Float], decodeOk: Boolean)

  /** Batched decode interface — the swap-in point for a real codec. */
  trait MediaCodec extends Serializable {
    /** Decode one payload to a fixed-dim feature vector; None = corrupt. */
    def decode(media: Array[Byte], meta: MediaMeta): Option[Array[Float]]
    def featureDim: Int
  }

  /**
   * STUB codec for the video modality (the one with no JDK decoder):
   * deterministic pseudo-features (splitmix64 over the bytes). Image uses
   * the real `ImageIoCodec`, audio the real `WavCodec`; everything
   * downstream (schema, batching, tests) is codec-agnostic.
   */
  object FakeCodec extends MediaCodec {
    val featureDim = 16
    private def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def decode(media: Array[Byte], meta: MediaMeta): Option[Array[Float]] = {
      if (media == null || media.isEmpty) return None // "corrupt" payload
      val h0 = graft.text.TextKernel.fnv64Bytes(media)
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < featureDim) {
        out(i) = (mix64(h0 ^ i.toLong).toDouble / Long.MaxValue).toFloat
        i += 1
      }
      Some(out)
    }
  }

  /** Synthesize a deterministic media table (payload bytes + typed metadata). */
  def generate(spark: SparkSession, n: Long, seed: Long, numPartitions: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id * 31 + seed) % 192
      val bytes = Array.tabulate(len.toInt)(i => ((id * 131 + i * 7 + seed) & 0xff).toByte)
      MediaRow(id, bytes,
        MediaMeta(kind, 32 + (id % 64).toInt, 32 + (id % 48).toInt,
          if (kind == "audio") 16000 else 0, 1000 + id % 60000))
    }
  }

  /**
   * Partition-batched feature extraction: one codec instance per partition
   * (per-batch setup amortized), rows streamed — no per-row UDF dispatch,
   * no driver collect. Output keeps doc_id so features re-join losslessly.
   */
  def extractFeatures(media: Dataset[MediaRow],
                      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec setup happens here (real codecs open handles)
      val c = codec
      rows.map { r =>
        c.decode(r.media, r.meta) match {
          case Some(f) => MediaFeatures(r.doc_id, r.meta.kind, c.featureDim, f, decodeOk = true)
          case None => MediaFeatures(r.doc_id, r.meta.kind, c.featureDim,
            Array.empty[Float], decodeOk = false)
        }
      }
    }
  }

  /** Resize/frame-sample style derived metadata, pure column ops (no UDF). */
  def withDerivedMeta(df: DataFrame): DataFrame =
    df.withColumn("aspect",
        when(col("meta.height") > 0,
          round(col("meta.width").cast("double") / col("meta.height"), 4)).otherwise(lit(null)))
      .withColumn("n_frames_sampled",
        when(col("meta.kind") === "video", greatest(lit(1), (col("meta.durationMs") / 1000).cast("int")))
          .otherwise(lit(1)))
      .withColumn("payload_bytes", length(col("media")).cast("long"))
}
