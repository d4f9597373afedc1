package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.st._

/**
 * IVF (inverted-file) coarse quantization — the second scale path for
 * similarity search next to SRP-LSH bucketing: vectors partition into k
 * coarse cells by nearest centroid; a query probes its `nprobe` nearest
 * cells and reranks exactly inside them, touching k/nprobe-th of the corpus
 * instead of all of it.
 *
 * Spark shapes:
 *  - `fit` trains centroids with Lloyd iterations on a BOUNDED deterministic
 *    sample (hash-ordered, `sampleN` rows). The sample collect is the one
 *    deliberate driver step — identical to what k-means|| implementations
 *    funnel to the driver — and is O(sampleN * dim), independent of corpus
 *    size. Everything downstream is distributed.
 *  - `assign` is crossJoin(broadcast(centroids)) + the bounded TopKAgg —
 *    k centroids are a constant-factor map per row, no shuffle beyond the
 *    tiny group-by on (id).
 *  - `search` probes nprobe cells per query and reranks with exact cosine.
 */
object Ivf {

  /** (centroid_id, centroid) rows. Deterministic in (df, k, iters, sampleN). */
  def fit(embeddings: DataFrame, embCol: String, k: Int,
          iters: Int = 5, sampleN: Int = 2048): Array[(Long, Array[Float])] = {
    val sample = embeddings
      .select(col(embCol).cast("array<float>").as("e"),
        xxhash64(col(embCol).cast("array<string>")).as("__h"))
      .orderBy("__h")
      .limit(sampleN)
      .select("e")
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.length >= k, s"ivf: sample ${sample.length} smaller than k=$k")
    val dim = sample(0).length
    var centroids = Array.tabulate(k)(i => sample(i).clone()) // deterministic init
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
        else Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat)
      }
      it += 1
    }
    centroids.zipWithIndex.map { case (c, i) => (i.toLong, c) }
  }

  private def nearest(cs: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestCos = Double.MinValue
    var i = 0
    while (i < cs.length) {
      val c = cosine(cs(i), v)
      if (c > bestCos) { bestCos = c; best = i }
      i += 1
    }
    best
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) -1.0 else dot / math.sqrt(na * nb)
  }

  private def centroidsDf(df: DataFrame, cs: Array[(Long, Array[Float])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    cs.toSeq.toDF("centroid_id", "centroid")
  }

  /** Attach `cell` = nearest-centroid id to every row (idCol must be a
   *  unique numeric id). Pure map + bounded agg — corpus-size independent
   *  shuffle of one row per input row. */
  def assign(df: DataFrame, idCol: String, embCol: String,
             cs: Array[(Long, Array[Float])]): DataFrame = {
    val cands = df.crossJoin(broadcast(centroidsDf(df, cs)))
      .withColumn("__cos", cosine_sim(col(embCol), col("centroid")))
    cands.groupBy(col(idCol))
      .agg(topk_by(col("__cos"), col("centroid_id"), 1, asc = false).as("__tk"))
      .select(col(idCol), element_at(col("__tk"), 1).getField("payload").as("cell"))
  }

  /** Top-`kNn` exact-cosine neighbours per query, probing `nprobe` cells.
   *  `data` must carry (idCol, embCol); queries likewise. */
  def search(data: DataFrame, queries: DataFrame, idCol: String, embCol: String,
             cs: Array[(Long, Array[Float])], nprobe: Int, kNn: Int): DataFrame = {
    val assigned = data.join(assign(data, idCol, embCol, cs), idCol)
    val qCells = queries.crossJoin(broadcast(centroidsDf(queries, cs)))
      .withColumn("__cos", cosine_sim(col(embCol), col("centroid")))
      .groupBy(col(idCol).as("qid"))
      .agg(topk_by(col("__cos"), col("centroid_id"), nprobe, asc = false).as("__tk"))
      .select(col("qid"), explode(col("__tk").getField("payload")).as("cell"))
    val qe = queries.select(col(idCol).as("qid"), col(embCol).as("__qe"))
    qCells.join(qe, "qid")
      .join(assigned, "cell")
      .filter(col("qid") =!= col(idCol))
      .withColumn("__cos", cosine_sim(col("__qe"), col(embCol)))
      .groupBy("qid")
      .agg(topk_by(col("__cos"), col(idCol), kNn, asc = false).as("__tk"))
      .select(col("qid"), posexplode(col("__tk")))
      .select(col("qid"), col("col.payload").as("nn"),
        (col("pos") + 1).cast("int").as("rnk"), col("col.score").as("cos"))
  }
}
