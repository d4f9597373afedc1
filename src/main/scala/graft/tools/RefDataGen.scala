package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Generates the recorded-literal DuckDB oracle SQL for the q_ref_* gates
 *  (reference golden-dataset queries): runs each gate query and prints a
 *  self-contained `WITH v(...) AS (VALUES ...) SELECT ...` matching the
 *  engine's output exactly. Run ONCE per deliberate change; the pinned
 *  values are independently cross-checked by scripts/check_refdata.py. */
object RefDataGen {

  def valuesSql(df: DataFrame): String = {
    val schema = df.schema
    val cols = schema.fields.map(_.name)
    def lit(v: Any, dt: DataType): String = v match {
      case null => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      case b: Boolean => if (b) "TRUE" else "FALSE"
      case n => n.toString
    }
    def cast(f: StructField): String = f.dataType match {
      case LongType => s"CAST(${f.name} AS BIGINT) AS ${f.name}"
      case IntegerType => s"CAST(${f.name} AS INT) AS ${f.name}"
      case DoubleType => s"CAST(${f.name} AS DOUBLE) AS ${f.name}"
      case _ => f.name
    }
    val rows = df.collect().map { r =>
      "(" + schema.fields.indices.map(i => lit(r.get(i), schema.fields(i).dataType))
        .mkString(", ") + ")"
    }
    s"""WITH v(${cols.mkString(", ")}) AS (VALUES
       |${rows.grouped(3).map(_.mkString(", ")).mkString(",\n")})
       |SELECT ${schema.fields.map(cast).mkString(",\n ").replace("\n ", "\n ")}
       |FROM v""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_ref_cities", "q_ref_nybb", "q_ref_countries", "q_ref_sjoin")
    // write UTF-8 files — city names are non-ASCII and console encoding mangles them
    val outDir = java.nio.file.Paths.get("/tmp/refdata_oracle")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val sql = valuesSql(graft.SparkEntry.queries(n)(spark, "/unused"))
      java.nio.file.Files.write(outDir.resolve(s"$n.sql"),
        sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/$n.sql (${sql.length} chars)")
    }
    spark.stop()
  }
}
