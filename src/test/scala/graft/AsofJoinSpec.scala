package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.join.AsofJoin

/** Backward as-of join: latest right row at-or-before each left timestamp,
 *  per key; exact-timestamp ties match (ASOF >= convention). */
class AsofJoinSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  test("asof semantics: carry-forward, ties match, missing history is null") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "l-a"), (1L, ts(20), "l-b"), (1L, ts(5), "l-c"),
      (2L, ts(10), "l-d"), (3L, ts(99), "l-e"))
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts(10), "r10"), (1L, ts(15), "r15"), (2L, ts(30), "r30"))
      .toDF("k", "ts", "rv")
    val out = AsofJoin.join(left, right, "k", "ts", Seq("rv"))
      .select("lv", "rv").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map(
      "l-a" -> "r10",  // exact-ts tie matches
      "l-b" -> "r15",  // latest at-or-before
      "l-c" -> null,   // before all right rows
      "l-d" -> null,   // right row exists but only later
      "l-e" -> null))  // key with no right rows at all
  }

  test("asof row atomicity: a right row with NULL in one value column is " +
    "carried whole, never stitched with an older row's column") {
    import spark.implicits._
    val left = Seq((1L, ts(20), "probe")).toDF("k", "ts", "lv")
    // older snapshot has both values; newest has a legitimate NULL in rv2.
    // Per-column carry-forward would stitch rv1="new" with rv2="old2" —
    // the struct carry must yield the newest row verbatim: ("new", null).
    val right = Seq(
      (1L, ts(5), Option("old1"), Option("old2")),
      (1L, ts(10), Option("new"), Option.empty[String]))
      .toDF("k", "ts", "rv1", "rv2")
    val out = AsofJoin.join(left, right, "k", "ts", Seq("rv1", "rv2"))
      .select("rv1", "rv2").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "new" && out(0).isNullAt(1))
  }

  test("joinBucketed matches join exactly, including a hyper-hot key") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // key 42 is hyper-hot (80% of left rows) — the skew the bucketed window
    // exists for; keys 1..5 are cold. Right snapshots land sparsely so many
    // left rows resolve across bucket boundaries (the carry pass).
    val left = (0 until 4000).map { i =>
      val k = if (rnd.nextInt(5) > 0) 42L else 1L + rnd.nextInt(5)
      (i.toLong, k, ts(rnd.nextInt(500000).toLong))
    }.toDF("id", "k", "ts")
    val right = (0 until 60).map { i =>
      val k = if (i % 3 == 0) 42L else 1L + rnd.nextInt(5)
      (k, ts(rnd.nextInt(500000).toLong * 7 % 500000), s"snap-$i")
    }.toDF("k", "ts", "rv")
      .groupBy("k", "ts").agg(first("rv").as("rv")) // contract: unique (k, ts)
    val plain = AsofJoin.join(left, right, "k", "ts", Seq("rv"))
      .select("id", "rv").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // 10s buckets -> ~50 buckets over the 500s span
    val bucketed = AsofJoin.joinBucketed(left, right, "k", "ts", Seq("rv"),
      c => floor(c.cast("long") / 10L).cast("long"))
      .select("id", "rv").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(bucketed.size == plain.size)
    assert(bucketed == plain)
    // sanity: the dataset actually exercises both passes
    assert(plain.count(_._2 != null) > 100 && plain.values.exists(_ == null))
  }

  test("null keys: joinBucketed matches join (null-safe stitch, ADVICE r4)") {
    import spark.implicits._
    // window partitioning groups a null key like any value, so null-key left
    // rows must match null-key right snapshots on BOTH paths — including
    // rows resolved by the boundary-carry pass (right at t=5, left at t=100:
    // different 10s buckets, so only the carry can deliver it)
    val left = Seq((1L, Option(7L), ts(100)), (2L, Option.empty[Long], ts(100)),
      (3L, Option.empty[Long], ts(3))).toDF("id", "k", "ts")
    val right = Seq((Option(7L), ts(5), "seven"), (Option.empty[Long], ts(5), "nullsnap"))
      .toDF("k", "ts", "rv")
    val expect = Map(1L -> "seven", 2L -> "nullsnap", 3L -> null)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "rv").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(res(AsofJoin.join(left, right, "k", "ts", Seq("rv"))) == expect)
    assert(res(AsofJoin.joinBucketed(left, right, "k", "ts", Seq("rv"),
      c => floor(c.cast("long") / 10L).cast("long"))) == expect)
  }

  test("joinAuto censuses the RIGHT side too (hot right key -> bucketed)") {
    import spark.implicits._
    // left is tiny and uniform; right has one key with 20k snapshots — the
    // plain window would sort all of them in ONE task. A left-only census
    // sees nothing; the fixed census must still pick the bucketed path.
    val left = Seq((1L, 7L, ts(999999))).toDF("id", "k", "ts")
    val right = (0 until 20000).map(i => (7L, ts(i.toLong * 7), s"s$i"))
      .toDF("k", "ts", "rv")
    val out = AsofJoin.joinAuto(left, right, "k", "ts", Seq("rv"),
      c => floor(c.cast("long") / 1000L).cast("long"),
      maxKeyRows = 1000, sampleRate = 0.05)
    assert(out.queryExecution.optimizedPlan.toString.contains("__b"))
    assert(out.collect().head.getAs[String]("rv") == "s19999")
  }

  test("joinAuto picks the bucketed plan under skew, the plain window otherwise") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val right = Seq((7L, ts(0), "r0"), (1L, ts(0), "r1")).toDF("k", "ts", "rv")
    def leftOf(hot: Boolean) = (0 until 20000).map { i =>
      val k = if (hot) 7L else 1L + rnd.nextInt(5000)
      (i.toLong, k, ts(rnd.nextInt(100000).toLong))
    }.toDF("id", "k", "ts")
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(c.cast("long") / 10L).cast("long")
    // skewed: every row on key 7 -> sampled hottest ~ 20000*rate >> 1000*rate
    val skewed = AsofJoin.joinAuto(leftOf(hot = true), right, "k", "ts",
      Seq("rv"), bucket, maxKeyRows = 1000, sampleRate = 0.05)
    assert(skewed.queryExecution.optimizedPlan.toString.contains("__b"))
    assert(skewed.count() == 20000)
    // uniform: ~4 rows/key -> plain window path (no bucket column anywhere)
    val uniform = AsofJoin.joinAuto(leftOf(hot = false), right, "k", "ts",
      Seq("rv"), bucket, maxKeyRows = 1000, sampleRate = 0.05)
    assert(!uniform.queryExecution.optimizedPlan.toString.contains("__b"))
    assert(uniform.count() == 20000)
  }

  test("asof column contracts: clash and empty valueCols rejected") {
    import spark.implicits._
    val l = Seq((1L, ts(0), "x")).toDF("k", "ts", "v")
    val r = Seq((1L, ts(0), "y")).toDF("k", "ts", "v")
    intercept[IllegalArgumentException](AsofJoin.join(l, r, "k", "ts", Seq("v")))
    intercept[IllegalArgumentException](AsofJoin.join(l, r, "k", "ts", Nil))
  }
}
