package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns for a training-data pipeline: media (image/audio/video)
 * travels as an opaque `binary` column plus a typed metadata struct; decode /
 * feature-extraction runs partition-batched so a real codec (JNI or a
 * vectorized library) can amortize per-batch setup.
 *
 * All three modalities decode for REAL with pure-JDK codecs:
 * image = `ImageIoCodec` (javax.imageio: PNG/BMP/GIF/JPEG), audio =
 * `WavCodec` (javax.sound.sampled: WAV/AIFF PCM), video = `AviDibCodec`
 * (own RIFF walker over standard AVI with uncompressed 24-bit DIB frames —
 * the JDK ships no compressed-video codec, but the uncompressed standard
 * needs none; replaced round-3's FakeCodec stub). `DispatchCodec` routes
 * each row by `meta.kind`.
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
    /** Width of the `features` arrays this codec EMITS (padding included). */
    def featureDim: Int
    /** True dim of this row's modality — entries past it are padding. */
    def dimFor(meta: MediaMeta): Int = featureDim
  }

  /**
   * Routes each row to the real codec for its modality and pads the feature
   * vector to a uniform width so one output schema serves a mixed table.
   * Unknown kinds and undecodable payloads report as corrupt (None).
   *
   * `featureDim` is the MAX of the routed codecs' dims (never truncates — a
   * future wider codec fails loudly at the require, instead of silently
   * losing features), and `dimFor` reports the routed codec's own dim so
   * consumers can tell real features from padding (audio emits 6 of 8).
   */
  object DispatchCodec extends MediaCodec {
    private val routes: Map[String, MediaCodec] =
      Map("image" -> ImageIoCodec, "audio" -> WavCodec, "video" -> AviDibCodec)
    val featureDim: Int = routes.valuesIterator.map(_.featureDim).max
    override def dimFor(meta: MediaMeta): Int =
      routes.get(meta.kind).map(_.featureDim).getOrElse(0)
    def decode(media: Array[Byte], meta: MediaMeta): Option[Array[Float]] = {
      val codec = routes.getOrElse(meta.kind, return None)
      codec.decode(media, meta).map { f =>
        require(f.length <= featureDim,
          s"codec for '${meta.kind}' emitted ${f.length} features > dispatcher width $featureDim")
        if (f.length == featureDim) f else java.util.Arrays.copyOf(f, featureDim)
      }
    }
  }

  /** Synthesize a deterministic media table: REAL payload bytes per modality
   *  (PNG via javax.imageio, PCM WAV, DIB AVI) + typed metadata. */
  def generate(spark: SparkSession, n: Long, seed: Long, numPartitions: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val w = 8 + ((id + seed) % 24).toInt
      val h = 8 + ((id + seed) % 16).toInt
      val fps = 5 + (id % 6).toInt
      val nFrames = 1 + (id % 5).toInt
      val nSamples = 64 + ((id * 31 + seed) % 192).toInt
      val bytes = kind match {
        case "image" => ImageKernel.pngConst(w, h,
          (id * 37 % 256).toInt, (id * 59 % 256).toInt, (id * 83 % 256).toInt)
        case "audio" => AudioKernel.wavSquare(16000, nSamples, 12000)
        case "video" => VideoKernel.aviGradient(w, h, nFrames, fps,
          (id * 37 % 200).toInt, (id * 59 % 200).toInt, (id * 83 % 200).toInt,
          (id % 12).toInt)
      }
      MediaRow(id, bytes,
        MediaMeta(kind, if (kind == "audio") 0 else w, if (kind == "audio") 0 else h,
          if (kind == "audio") 16000 else 0,
          if (kind == "video") nFrames * 1000L / fps
          else if (kind == "audio") nSamples * 1000L / 16000 else 0))
    }
  }

  /**
   * Partition-batched feature extraction: one codec instance per partition
   * (per-batch setup amortized), rows streamed — no per-row UDF dispatch,
   * no driver collect. Output keeps doc_id so features re-join losslessly.
   */
  def extractFeatures(media: Dataset[MediaRow],
                      codec: MediaCodec = DispatchCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec setup happens here (real codecs open handles)
      val c = codec
      rows.map { r =>
        // featureDim records the MODALITY's true dim (entries past it in the
        // uniformly-padded array are padding), not the dispatcher's width
        c.decode(r.media, r.meta) match {
          case Some(f) => MediaFeatures(r.doc_id, r.meta.kind, c.dimFor(r.meta), f, decodeOk = true)
          case None => MediaFeatures(r.doc_id, r.meta.kind, c.dimFor(r.meta),
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
