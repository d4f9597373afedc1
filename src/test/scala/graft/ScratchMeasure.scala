package graft
import org.apache.spark.sql.functions._
import graft.functions.st._
class ScratchMeasure extends SparkSpec {
  test("measure") {
    val s = spark
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val acc = docs.select(avg(when(lang_id(col("text")) === col("lang"), 1.0).otherwise(0.0)).as("acc")).collect()(0).getDouble(0)
      println(s"LANG_ACC $dir $acc")
      // geodesic agreement
      val l = s.read.parquet(s"$dir/lineitem.parquet").limit(20000)
        .withColumn("lat1", ((col("l_orderkey") % 110) - 55 + 0.25).cast("double"))
        .withColumn("lon1", ((col("l_partkey") % 340) - 170 + 0.25).cast("double"))
        .withColumn("lat2", ((col("l_suppkey") % 110) - 55 + 0.25).cast("double"))
        .withColumn("lon2", ((col("l_partkey") * 7 % 340) - 170 + 0.25).cast("double"))
      val line = st_makeLine(col("lon1"), col("lat1"), col("lon2"), col("lat2"))
      val gd = l.select(
        st_geodesicLength(line, "vincenty").as("v"),
        st_geodesicLength(line, "geodesic").as("k"),
        st_geodesicLength(line, "haversine").as("hv"))
      val stats = gd.select(
        max(abs(col("v") - col("k")) / greatest(col("k"), lit(1.0))).as("max_rel_vk"),
        max(abs(col("k") / greatest(col("hv"), lit(1.0)) - 1.0)).as("max_ratio_kh"),
        min(col("k") / greatest(col("hv"), lit(1.0))).as("min_ratio")).collect()(0)
      println(s"GEOD $dir max_rel_vk=${stats.getDouble(0)} max_kh_dev=${stats.getDouble(1)} min_ratio=${stats.getDouble(2)}")
      // ann recall: top-1 per query among others; does it share the lsh bucket?
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      for (bits <- Seq(4, 8)) {
        val eb = e.select(col("vec_id"), col("embedding"), cosine_lsh_bucket(col("embedding"), lit(bits)).as("bkt"))
        val q = eb.filter(col("vec_id") < 30).select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bkt").as("qb"))
        val top1 = eb.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
          .withColumn("cos", cosine_sim(col("qe"), col("embedding")))
          .groupBy("qid", "qb").agg(topk_by(col("cos"), col("vec_id"), 1, asc = false).as("tk"))
          .select(col("qid"), col("qb"), element_at(col("tk"), 1).getField("payload").as("nn"))
        val rec = top1.join(eb.select(col("vec_id").as("nn"), col("bkt").as("nb")), "nn")
          .select(avg(when(col("qb") === col("nb"), 1.0).otherwise(0.0)).as("recall")).collect()(0).getDouble(0)
        println(s"ANN_RECALL $dir bits=$bits $rec")
      }
    }
  }
}
