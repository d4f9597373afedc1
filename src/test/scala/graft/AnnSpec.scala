package graft

import org.apache.spark.sql.functions._

import graft.functions.st._

/** ANN probing structure: the multi-probe bucket set is exactly the Hamming
 *  ball around the vector's own bucket. */
class AnnSpec extends SparkSpec {

  test("cosine_lsh_probes: own bucket first, full Hamming ball, right sizes") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
      .select(col("vec_id"), col("embedding"),
        cosine_lsh_bucket(col("embedding"), lit(8)).as("own"),
        cosine_lsh_probes(col("embedding"), lit(8), lit(1)).as("p1"),
        cosine_lsh_probes(col("embedding"), lit(8), lit(2)).as("p2"))
    val rows = df.select("own", "p1", "p2")
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (own, p1, p2) =>
      assert(p1.size == 9 && p2.size == 9 + 28) // 1 + C(8,1) [+ C(8,2)]
      assert(p1.head == own && p2.head == own)
      assert(p1.distinct.size == p1.size && p2.distinct.size == p2.size)
      p1.foreach(b => assert(java.lang.Long.bitCount(b ^ own) <= 1))
      p2.foreach(b => assert(java.lang.Long.bitCount(b ^ own) <= 2))
      // the ball is complete: every 1-flip neighbour present
      (0 until 8).foreach(i => assert(p1.contains(own ^ (1L << i))))
    }
  }

  test("query-side probing finds strictly more candidates than single probe") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        cosine_lsh_bucket(col("embedding"), lit(6)).as("bkt"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"),
        explode(cosine_lsh_probes(col("embedding"), lit(6), lit(1))).as("bkt"))
    val single = e.join(q.groupBy("qid").agg(first("bkt").as("bkt")), "bkt").count()
    val probed = e.join(q, "bkt").count()
    assert(probed > single, s"probed=$probed single=$single")
  }
}
