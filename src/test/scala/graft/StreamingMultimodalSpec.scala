package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.multimodal.Multimodal
import graft.streaming.Streams

class StreamingMultimodalSpec extends SparkSpec {

  test("multimodal: batched feature extraction preserves ids, flags corrupt payloads") {
    import spark.implicits._
    val media = Multimodal.generate(spark, 200, seed = 5, numPartitions = 4)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 200)
    // every payload is a REAL encodable-decodable file now (PNG/WAV/AVI):
    // all three modalities must decode through their real codecs
    assert(feats.forall(_.decodeOk))
    assert(feats.forall(_.features.length == Multimodal.DispatchCodec.featureDim))
    assert(Set("image", "audio", "video").subsetOf(feats.map(_.kind).toSet))
    // video features carry real decoded stats: width/height/frames match meta
    val media0 = media.collect().map(m => m.doc_id -> m).toMap
    feats.filter(_.kind == "video").foreach { f =>
      val m = media0(f.doc_id)
      assert(f.features(0) == m.meta.width.toFloat &&
        f.features(1) == m.meta.height.toFloat)
      assert(f.features(2) >= 1f) // n_frames
    }
    // determinism: same id -> same features across runs
    val again = Multimodal.extractFeatures(
      Multimodal.generate(spark, 200, seed = 5, numPartitions = 8)).collect()
    val byId = again.map(f => f.doc_id -> f.features.toSeq).toMap
    assert(feats.forall(f => byId(f.doc_id) == f.features.toSeq))
    // corrupt payload path
    val corrupt = Seq(Multimodal.MediaRow(99L, Array.empty[Byte],
      Multimodal.MediaMeta("image", 1, 1, 0, 0))).toDS()
    val cf = Multimodal.extractFeatures(corrupt).collect()
    assert(cf.length == 1 && !cf(0).decodeOk && cf(0).features.isEmpty)
  }

  test("multimodal: featureDim reports the modality's true dim, pad never truncates (ADVICE r4)") {
    import graft.multimodal.{WavCodec, ImageIoCodec, AviDibCodec}
    // dispatcher width = max of routed codecs (pad-only by construction)
    assert(Multimodal.DispatchCodec.featureDim ==
      Seq(WavCodec, ImageIoCodec, AviDibCodec).map(_.featureDim).max)
    val feats = Multimodal.extractFeatures(
      Multimodal.generate(spark, 60, seed = 5, numPartitions = 2)).collect()
    // audio rows: array padded to dispatcher width, featureDim = WavCodec's 6,
    // and the pad region is zeros — consumers can split real from padding
    val audio = feats.filter(_.kind == "audio")
    assert(audio.nonEmpty && audio.forall(f =>
      f.featureDim == WavCodec.featureDim &&
        f.features.length == Multimodal.DispatchCodec.featureDim &&
        f.features.drop(f.featureDim).forall(_ == 0f)))
    assert(feats.filter(_.kind == "image").forall(_.featureDim == ImageIoCodec.featureDim))
  }

  test("multimodal: derived metadata columns (aspect, frame sampling, payload size)") {
    val media = Multimodal.generate(spark, 30, 5, 2).toDF()
    val derived = Multimodal.withDerivedMeta(media)
    val rows = derived.select("meta.kind", "aspect", "n_frames_sampled", "payload_bytes").collect()
    assert(rows.forall(r => r.getLong(3) > 0))
    assert(rows.filter(_.getString(0) == "video").forall(_.getInt(2) >= 1))
    assert(rows.filter(_.getString(0) != "video").forall(_.getInt(2) == 1))
  }

  test("streaming: watermarked windowed counts over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowedCounts(events, watermark = "1 minute", window = "1 minute")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData(
        (new Timestamp(t0), "click", 1.0),
        (new Timestamp(t0 + 10000), "click", 2.0),
        (new Timestamp(t0 + 20000), "view", 5.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the first window
      input.addData((new Timestamp(t0 + 10 * 60000), "click", 1.0))
      q.processAllAvailable()
      val res = spark.sql("select * from win_counts").collect()
      val click = res.find(r => r.getString(1) == "click").get
      assert(click.getLong(2) == 2 && click.getDouble(3) == 3.0)
      val view = res.find(r => r.getString(1) == "view").get
      assert(view.getLong(2) == 1)
    } finally q.stop()
  }

  test("streaming: flatMapGroupsWithState sessionization closes on event-time gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionize(input.toDS(), gapMs = 60000) // 1-minute gap
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData(
        Streams.Event(1, new Timestamp(t0), 7L, "click", 1.0),
        Streams.Event(2, new Timestamp(t0 + 1000), 7L, "view", 2.0))
      q.processAllAvailable()
      // watermark moves with max event time; push it past user 7's gap
      input.addData(Streams.Event(3, new Timestamp(t0 + 10 * 60000), 8L, "click", 9.0))
      q.processAllAvailable()
      // one more batch so the timed-out state is evaluated and emitted
      input.addData(Streams.Event(4, new Timestamp(t0 + 11 * 60000), 8L, "view", 1.0))
      q.processAllAvailable()
      val sessions = spark.sql("select * from sessions").as[Streams.Session].collect()
      val closed = sessions.filter(_.closed)
      assert(closed.exists(s => s.user_id == 7L && s.events == 2 && s.total == 3.0))
    } finally q.stop()
  }
}
