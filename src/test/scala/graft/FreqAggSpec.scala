package graft

import org.apache.spark.sql.functions._
import graft.expr.FreqAgg

/** Misra-Gries heavy-hitters: exact when k >= distinct; otherwise every
 *  estimate under-counts by at most n/(k+1) and every item above that
 *  threshold is guaranteed present — including through merges. */
class FreqAggSpec extends SparkSpec {

  test("exact regime: k >= distinct items reproduces groupBy counts (distributed)") {
    import spark.implicits._
    val rows = (0 until 20000).map(i => (i % 37).toLong)
    val df = rows.toDF("item").repartition(16)
    val got = df.agg(FreqAgg.freq_items(col("item"), 64).as("f"))
      .select(explode(col("f")).as("e"))
      .select(col("e.item"), col("e.count")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(got == exact)
  }

  test("approximate regime: n/(k+1) bound holds, heavy items always present") {
    val k = 16
    val rnd = new scala.util.Random(7)
    // skewed stream: 4 heavy items + a long tail of distinct ids
    val stream = scala.collection.mutable.ArrayBuffer.empty[Long]
    (0 until 4).foreach(h => (0 until 2000).foreach(_ => stream += h.toLong))
    (0 until 8000).foreach(i => stream += 1000L + i)
    val shuffled = rnd.shuffle(stream)
    val n = shuffled.size
    val truth = shuffled.groupBy(identity).map { case (i, v) => (i, v.size.toLong) }

    // single-stream buffer AND a 7-way merged set of buffers must both obey
    // the bound (merge = mergeable-summaries shrink)
    val single = new FreqAgg.Buf(k)
    shuffled.foreach(single.offer(_, 1L))
    val parts = shuffled.grouped(math.max(1, n / 7)).map { chunk =>
      val b = new FreqAgg.Buf(k)
      chunk.foreach(b.offer(_, 1L))
      b
    }.toSeq
    val merged = parts.reduce { (a, b) =>
      b.counts.foreachEntry((i, c) => a.offerNoShrink(i, c)); a.shrinkToK(); a
    }

    for ((name, buf) <- Seq(("single", single), ("merged", merged))) {
      assert(buf.counts.size <= k, s"$name size ${buf.counts.size}")
      val bound = n / (k + 1) + 1
      buf.counts.foreachEntry { (item, est) =>
        val t = truth(item)
        assert(est <= t, s"$name over-estimates $item: $est > $t")
        assert(est >= t - bound, s"$name under-bound $item: $est < $t - $bound")
      }
      truth.foreach { case (item, t) =>
        if (t > bound) assert(buf.counts.contains(item),
          s"$name lost heavy item $item (count $t > $bound)")
      }
    }
  }
}
