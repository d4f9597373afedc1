package graft

import org.apache.spark.sql.functions._

import graft.functions.st._
import graft.text.Ivf

/** IVF coarse quantization: exactness when probing every cell, recall gain
 *  when probing few, deterministic fit. */
class IvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("exhaustive probe (nprobe=k) equals brute-force top-1 exactly") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cs = Ivf.fit(e, "embedding", k = 8, iters = 3, sampleN = 200)
    val q = e.filter(col("vec_id") < 12)
    val brute = e.crossJoin(broadcast(
      q.select(col("vec_id").as("qid"), col("embedding").as("qe"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine_sim(col("qe"), col("embedding")))
      .groupBy("qid")
      .agg(topk_by(col("cos"), col("vec_id"), 1, asc = false).as("tk"))
      .select(col("qid"), element_at(col("tk"), 1).getField("payload").as("nn"))
    val ivf = Ivf.search(e, q, "vec_id", "embedding", cs, nprobe = 8, kNn = 1)
      .filter(col("rnk") === 1).select(col("qid"), col("nn"))
    assert(brute.except(ivf).isEmpty && ivf.except(brute).isEmpty)
  }

  test("assign: every row lands in exactly one valid cell; fit deterministic") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cs1 = Ivf.fit(e, "embedding", k = 8, iters = 3, sampleN = 200)
    val cs2 = Ivf.fit(e, "embedding", k = 8, iters = 3, sampleN = 200)
    assert(cs1.map(_._1).sameElements(cs2.map(_._1)))
    assert(cs1.zip(cs2).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    val assigned = Ivf.assign(e, "vec_id", "embedding", cs1)
    assert(assigned.count() == e.count())
    assert(assigned.filter(col("cell") < 0 || col("cell") >= 8).isEmpty)
    assert(assigned.select("vec_id").distinct().count() == e.count())
  }

  test("partial probe recall beats the scanned-fraction baseline") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cs = Ivf.fit(e, "embedding", k = 8, iters = 3, sampleN = 200)
    val q = e.filter(col("vec_id") < 12)
    val brute = e.crossJoin(broadcast(
      q.select(col("vec_id").as("qid"), col("embedding").as("qe"))))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine_sim(col("qe"), col("embedding")))
      .groupBy("qid")
      .agg(topk_by(col("cos"), col("vec_id"), 1, asc = false).as("tk"))
      .select(col("qid"), element_at(col("tk"), 1).getField("payload").as("nn"))
    val ivf = Ivf.search(e, q, "vec_id", "embedding", cs, nprobe = 2, kNn = 1)
      .filter(col("rnk") === 1).select(col("qid"), col("nn").as("inn"))
    val recall = brute.join(ivf, "qid")
      .agg(avg(when(col("nn") === col("inn"), 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
    assert(recall > 2.0 / 8, s"recall $recall not above scanned fraction")
  }
}
