package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * All unordered pairs of distinct rows sharing bucket-key columns — the
 * candidate-pair step of LSH dedup / ANN — with an explicit degenerate-bucket
 * guard. A bucket holding b rows yields ~b^2/2 pairs; boilerplate-heavy crawl
 * text guarantees hot buckets, and a plain self-equi-join materializes each
 * hot bucket's pairs in ONE task. Here a census finds buckets above
 * `hotThreshold`, and their rows are triangle-sharded: each row picks a
 * deterministic shard s in [0, nShards); the left side replicates to shard
 * pairs (s, s..n-1), the right side to (0..s, s), so the b^2 pair work
 * spreads over n(n+1)/2 tasks while every unordered pair still meets exactly
 * once per bucket. Cold buckets pay nothing (a single (0,0) shard key on both
 * sides, no replication).
 *
 * Output: bucket columns + every other input column twice, suffixed
 * `_a`/`_b`, canonicalized so idCol_a < idCol_b. A pair sharing several
 * buckets appears once per bucket (same as the plain join) — callers dedupe
 * on (id_a, id_b) as they would anyway.
 */
object SelfJoin {

  def pairs(df: DataFrame, bucketCols: Seq[String], idCol: String,
            nShards: Int = 16, hotThreshold: Long = 5000L,
            censusSampleRate: Double = Double.NaN): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val payload = df.columns.filterNot(bucketCols.contains).toSeq
    val bCols = bucketCols.map(col)

    // Hot-bucket census, optionally on a seeded SAMPLE. The guard only needs
    // buckets that are catastrophically large: sampling at rate p detects a
    // bucket of b rows with ~Poisson(b*p) hits, and p maps the threshold to
    // >=20 expected hits — a bucket at 2x threshold is missed with
    // probability < 1e-9, and a missed borderline bucket merely runs as one
    // bigger task (the OUTPUT is identical either way). Note the sample sits
    // above df's own projections, so it thins the census aggregation, not
    // df's computation — callers whose df is expensive (LSH signatures)
    // should persist/materialize df before calling, which is also what a
    // production signature table does. Pass 1.0 for an exact census.
    val p = if (censusSampleRate.isNaN) math.min(1.0, 20.0 / math.max(1L, hotThreshold))
      else censusSampleRate
    val censusSrc = if (p >= 1.0) df else df.sample(withReplacement = false, p, seed = 42)
    val hot = censusSrc.groupBy(bCols: _*).count()
      .filter(col("count") > (hotThreshold * p).toLong)
      .drop("count")
      .withColumn("__hot", lit(true))

    val base = df.join(broadcast(hot), bucketCols, "left")
      .withColumn("__shard",
        when(col("__hot") === true, pmod(xxhash64(col(idCol)), lit(nShards)).cast("int"))
          .otherwise(lit(0)))

    val keyCols = bucketCols ++ Seq("__sa", "__sb")
    val lSide = base
      .withColumn("__sa", col("__shard"))
      .withColumn("__sb", explode(
        when(col("__hot") === true, sequence(col("__shard"), lit(nShards - 1)))
          .otherwise(array(col("__shard")))))
      .select(bCols ++ Seq(col("__sa"), col("__sb")) ++
        payload.map(c => col(c).as(c + "_l")): _*)
    val rSide = base
      .withColumn("__sb", col("__shard"))
      .withColumn("__sa", explode(
        when(col("__hot") === true, sequence(lit(0), col("__shard")))
          .otherwise(array(col("__shard")))))
      .select(bCols ++ Seq(col("__sa"), col("__sb")) ++
        payload.map(c => col(c).as(c + "_r")): _*)

    val idL = col(idCol + "_l"); val idR = col(idCol + "_r")
    val j = lSide.join(rSide, keyCols)
      // a same-shard task sees both orientations of a pair: keep one by id
      // order. A cross-shard task sees exactly one orientation: keep it
      // whatever the id order (dropping id_l > id_r there would LOSE pairs).
      .filter(col("__sa") =!= col("__sb") || idL < idR)
      .filter(idL =!= idR)

    val keepLeftFirst = idL < idR
    j.select(bCols ++ payload.flatMap(c => Seq(
      when(keepLeftFirst, col(c + "_l")).otherwise(col(c + "_r")).as(c + "_a"),
      when(keepLeftFirst, col(c + "_r")).otherwise(col(c + "_l")).as(c + "_b"))): _*)
  }
}
