package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off generator/checker for recorded-literal oracles (run manually,
 *  not part of the gate): prints the VALUES clauses for q_s2_cells /
 *  q_h3_cells / q_pages_pipeline, and empirical checks for q_lang_id /
 *  q_ann_lsh oracle design. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. lang_id vs lang mismatches on documents
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mism = docs.select(graft.functions.st.lang_id(col("text")).as("g"), col("lang"))
      .filter(col("g") =!= col("lang") || col("g").isNull).count()
    println(s"LANG_MISMATCHES $mism of ${docs.count()}")

    // 2. embeddings: min norm + vec_id schema
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.printSchema()
    println("MIN_NORM " + emb.select(min(graft.functions.st.l2_norm(col("embedding")))).head())

    // 3. recorded VALUES for q_s2_cells / q_h3_cells
    def dumpValues(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir).orderBy("custkey")
      val rows = df.collect().map { r =>
        "(" + (0 until r.length).map { i =>
          r.get(i) match {
            case b: Boolean => if (b) "TRUE" else "FALSE"
            case v => v.toString
          }
        }.mkString(", ") + ")"
      }
      println(s"VALUES_$name cols=${df.columns.mkString(",")}")
      println(rows.grouped(3).map(_.mkString(", ")).mkString(",\n"))
    }
    dumpValues("q_s2_cells")
    dumpValues("q_h3_cells")

    // 4. recorded VALUES for q_pages_pipeline census
    val pp = graft.SparkEntry.queries("q_pages_pipeline")(spark, sfDir).orderBy("admin_id")
    val ppRows = pp.collect().map { r =>
      s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)}, " +
        (if (r.getBoolean(4)) "TRUE" else "FALSE") + ")"
    }
    println(s"VALUES_q_pages_pipeline cols=${pp.columns.mkString(",")} n=${ppRows.length}")
    println(ppRows.grouped(2).map(_.mkString(", ")).mkString(",\n"))

    spark.stop()
  }
}
