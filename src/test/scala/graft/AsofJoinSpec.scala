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

  test("asof column contracts: clash and empty valueCols rejected") {
    import spark.implicits._
    val l = Seq((1L, ts(0), "x")).toDF("k", "ts", "v")
    val r = Seq((1L, ts(0), "y")).toDF("k", "ts", "v")
    intercept[IllegalArgumentException](AsofJoin.join(l, r, "k", "ts", Seq("v")))
    intercept[IllegalArgumentException](AsofJoin.join(l, r, "k", "ts", Nil))
  }
}
