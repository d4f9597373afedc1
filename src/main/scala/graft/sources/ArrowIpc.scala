package graft.sources

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/**
 * Arrow IPC *file* (Feather v2) ingestion — the format the reference stores
 * its golden datasets in and reads with `polars.read_ipc`
 * (py-geopolars datasets/__init__.py:38-41, io/ipc.py): `cities.arrow`,
 * `naturalearth_cities.arrow`, `naturalearth_lowres.arrow`, `nybb.arrow`.
 * This is what lets the engine's gates run on the reference's REAL bytes
 * rather than only on synthetic fixtures.
 *
 * Spark-first shape: the IPC footer indexes every record batch, so the scan
 * parallelizes at RECORD-BATCH grain — one task per (file, batch), each
 * seeking straight to its block and decoding on EXECUTORS with the Arrow
 * jars Spark already ships. A single huge feather file fans out across the
 * cluster; per-task memory is bounded by one batch, never a file. Driver
 * work is one footer read per file (schema + batch index).
 *
 * Type subset: the Arrow types the golden data and common feather files use
 * — dictionary-encoded columns (decoded to their value type) and
 * LZ4/ZSTD-compressed record batches (pyarrow's feather default) included:
 * utf8/large-utf8, binary/large-binary, bool, int 8/16/32/64 signed and
 * unsigned (unsigned widens to the next signed Spark type; uint64 is
 * rejected rather than silently wrapped), float32/64, date (day/milli) and
 * timestamp at every Arrow unit (normalized to microseconds, nanos floor;
 * zone-tagged -> TimestampType instants, naive -> TimestampNTZ wall-clock).
 * Anything else fails fast with the field name.
 */
object ArrowIpc {

  /** Spark schema of an IPC file, from one driver-side footer read. */
  def schemaOf(path: String): StructType = {
    val alloc = new RootAllocator()
    try {
      val reader = new ArrowFileReader(
        new org.apache.arrow.vector.ipc.SeekableReadChannel(
          new java.io.RandomAccessFile(path, "r").getChannel), alloc,
        CommonsCompressionFactory.INSTANCE)
      try sparkSchema(reader)
      finally reader.close()
    } finally alloc.close()
  }

  /** Schema-level custom metadata of an IPC file (one footer read). The
   *  reference's golden files carry a `geo` key (GeoParquet-style JSON with
   *  the primary geometry column + CRS) and a `pandas` key; `geo`'s CRS can
   *  be handed to the Proj/ProjString machinery. */
  def metadataOf(path: String): Map[String, String] = {
    val alloc = new RootAllocator()
    try {
      val reader = new ArrowFileReader(
        new org.apache.arrow.vector.ipc.SeekableReadChannel(
          new java.io.RandomAccessFile(path, "r").getChannel), alloc,
        CommonsCompressionFactory.INSTANCE)
      try {
        import scala.jdk.CollectionConverters._
        reader.getVectorSchemaRoot.getSchema.getCustomMetadata.asScala.toMap
      } finally reader.close()
    } finally alloc.close()
  }

  /**
   * CRS of the primary geometry column, from the GeoParquet-style `geo`
   * schema metadata, re-serialized as a PROJJSON string —
   * `ProjString.parse`-ready, so `ArrowIpc.crsOf(f)` feeds straight into
   * `st_transform(geom, ArrowIpc.crsOf(f).get, target)`. None when the file
   * carries no geo metadata or no crs for its primary column.
   */
  def crsOf(path: String): Option[String] =
    metadataOf(path).get("geo").flatMap { geoJson =>
      graft.geom.ProjString.Json.parse(geoJson) match {
        case m: Map[String @unchecked, Any @unchecked] =>
          val primary = m.get("primary_column") match {
            case Some(s: String) => s
            case _ => "geometry"
          }
          for {
            cols <- m.get("columns").collect { case c: Map[String @unchecked, Any @unchecked] => c }
            colMeta <- cols.get(primary).collect { case c: Map[String @unchecked, Any @unchecked] => c }
            crs <- colMeta.get("crs") if crs != null
          } yield jsonText(crs)
        case _ => None
      }
    }

  /** Re-serialize a parsed JSON value (the Json parser's Map/List/Double/
   *  String/Boolean/null shapes) back to JSON text. */
  private def jsonText(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case d: Double => if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case l: List[_] => l.map(jsonText).mkString("[", ",", "]")
    case m: Map[_, _] => m.map { case (k, x) =>
      jsonText(k.asInstanceOf[String]) + ":" + jsonText(x)
    }.mkString("{", ",", "}")
    case other => throw new IllegalArgumentException(s"unexpected JSON node $other")
  }

  /** Record-batch count of an IPC file (from the footer's batch index). */
  def blockCountOf(path: String): Int = {
    val alloc = new RootAllocator()
    try {
      val reader = new ArrowFileReader(
        new org.apache.arrow.vector.ipc.SeekableReadChannel(
          new java.io.RandomAccessFile(path, "r").getChannel), alloc,
        CommonsCompressionFactory.INSTANCE)
      try reader.getRecordBlocks.size()
      finally reader.close()
    } finally alloc.close()
  }

  /**
   * Read one or more Arrow IPC files as a DataFrame (schema from the first
   * file; every file must share it, like a parquet directory).
   *
   * Parallel grain: one task per RECORD BATCH, not per file — the IPC
   * footer indexes every batch, so each task opens its file and seeks
   * straight to its block (`loadRecordBatch`). A single multi-gigabyte
   * feather file therefore fans out across the cluster, and nothing ever
   * materializes a whole file in memory (the per-task bound is one batch).
   * Paths must be reachable from executors (local/shared filesystem — the
   * golden-data and export layouts here; an HDFS-backed variant would swap
   * the RandomAccessFile channel for the Hadoop stream).
   */
  def read(spark: SparkSession, paths: String*): DataFrame = {
    require(paths.nonEmpty, "ArrowIpc.read needs at least one path")
    val schema = schemaOf(paths.head)
    val blocks: Seq[(String, Int)] =
      paths.flatMap(p => (0 until blockCountOf(p)).map(p -> _))
    import spark.implicits._
    val nSlices = math.max(1, math.min(blocks.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(blocks).repartition(nSlices)
      .mapPartitions { iter =>
        iter.flatMap { case (path, block) => decodeBlock(path, block, schema) }
      }(Encoders.row(schema))
  }

  /** Decode ONE record batch of one IPC file into Rows: open, seek to the
   *  block, copy out, close — per-task memory is bounded by this batch. */
  private def decodeBlock(path: String, block: Int, schema: StructType): Iterator[Row] = {
    val alloc = new RootAllocator()
    val out = ArrayBuffer.empty[Row]
    try {
      val reader = new ArrowFileReader(
        new org.apache.arrow.vector.ipc.SeekableReadChannel(
          new java.io.RandomAccessFile(path, "r").getChannel), alloc,
        CommonsCompressionFactory.INSTANCE)
      try {
        val root = reader.getVectorSchemaRoot
        val fileSchema = sparkSchema(reader)
        require(fileSchema == schema,
          s"IPC file schema $fileSchema of $path differs from the first file's $schema")
        require(reader.loadRecordBatch(reader.getRecordBlocks.get(block)),
          s"failed to load record batch $block of $path")
        val n = root.getRowCount
        val vectors = root.getFieldVectors
        // dictionary-encoded columns: the loaded vector holds indexes; the
        // values live in the reader's dictionary vectors
        val dicts: Array[FieldVector] = (0 until vectors.size()).map { c =>
          val enc = vectors.get(c).getField.getDictionary
          if (enc == null) null
          else reader.getDictionaryVectors.get(enc.getId).getVector
        }.toArray
        var i = 0
        while (i < n) {
          val vals = new Array[Any](vectors.size())
          var c = 0
          while (c < vectors.size()) {
            val v = vectors.get(c)
            vals(c) =
              if (dicts(c) == null) readValue(v, i)
              else if (v.isNull(i)) null
              else readValue(dicts(c), dictIndex(v, i))
            c += 1
          }
          out += Row.fromSeq(vals.toIndexedSeq)
          i += 1
        }
      } finally reader.close()
    } finally alloc.close()
    out.iterator
  }

  private def readValue(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) return null
    v match {
      case s: VarCharVector => new String(s.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case s: LargeVarCharVector => new String(s.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case b: VarBinaryVector => b.get(i)
      case b: LargeVarBinaryVector => b.get(i)
      case d: Float8Vector => d.get(i)
      case f: Float4Vector => f.get(i)
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: TinyIntVector => x.get(i)
      case x: UInt1Vector => (x.get(i) & 0xff).toShort   // widen: uint8 -> short
      case x: UInt2Vector => (x.get(i) & 0xffff).toInt   // uint16 -> int (get returns char)
      case x: UInt4Vector => x.get(i) & 0xffffffffL      // uint32 -> long
      case b: BitVector => b.get(i) == 1
      case d: DateDayVector =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.get(i).toLong))
      case d: DateMilliVector =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(Math.floorDiv(d.get(i), 86400000L)))
      // zone-tagged timestamps are instants (Spark TimestampType); NAIVE
      // (tz=null) timestamps are wall-clock values and land as
      // TimestampNTZ/LocalDateTime — decoding them as UTC instants would
      // shift them by the session-zone offset vs polars/pandas semantics
      case t: TimeStampMicroTZVector => microsToTimestamp(t.get(i))
      case t: TimeStampMilliTZVector => microsToTimestamp(Math.multiplyExact(t.get(i), 1000L))
      case t: TimeStampSecTZVector => microsToTimestamp(Math.multiplyExact(t.get(i), 1000000L))
      case t: TimeStampNanoTZVector => microsToTimestamp(Math.floorDiv(t.get(i), 1000L))
      case t: TimeStampMicroVector => microsToLocal(t.get(i))
      case t: TimeStampMilliVector => microsToLocal(Math.multiplyExact(t.get(i), 1000L))
      case t: TimeStampSecVector => microsToLocal(Math.multiplyExact(t.get(i), 1000000L))
      case t: TimeStampNanoVector => microsToLocal(Math.floorDiv(t.get(i), 1000L))
      case other => throw new IllegalArgumentException(
        s"unsupported Arrow vector ${other.getClass.getSimpleName} for field ${other.getName}")
    }
  }

  // java.sql types: Encoders.row's serializer expects the legacy external
  // types (java.time.Instant needs the java8-datetime session flag)
  private def microsToTimestamp(micros: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))

  /** Naive wall-clock micros -> LocalDateTime (TimestampNTZ external type). */
  private def microsToLocal(micros: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)

  /** Index value of a dictionary-encoded cell (index vectors are ints of
   *  some width). */
  private def dictIndex(v: FieldVector, i: Int): Int = v match {
    case x: TinyIntVector => x.get(i).toInt
    case x: SmallIntVector => x.get(i).toInt
    case x: IntVector => x.get(i)
    case x: BigIntVector => Math.toIntExact(x.get(i))
    case x: UInt1Vector => x.get(i) & 0xff
    case x: UInt2Vector => x.get(i) & 0xffff
    case x: UInt4Vector => Math.toIntExact(x.get(i) & 0xffffffffL)
    case other => throw new IllegalArgumentException(
      s"unsupported dictionary index vector ${other.getClass.getSimpleName}")
  }

  /** Schema from an open reader; dictionary-encoded fields resolve to the
   *  DICTIONARY's value type (the in-memory field carries the index type). */
  private def sparkSchema(reader: ArrowFileReader): StructType = {
    import scala.jdk.CollectionConverters._
    StructType(reader.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq.map { f =>
      val enc = f.getDictionary
      val valueField =
        if (enc == null) f
        else reader.getDictionaryVectors.get(enc.getId).getVector.getField
      StructField(f.getName, sparkType(valueField), nullable = f.isNullable)
    })
  }

  private def sparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.Bool => BooleanType
    case fp: ArrowType.FloatingPoint =>
      fp.getPrecision match {
        case org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE => FloatType
        case org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE => DoubleType
        case p => throw new IllegalArgumentException(s"unsupported float precision $p (${f.getName})")
      }
    case it: ArrowType.Int =>
      (it.getBitWidth, it.getIsSigned) match {
        case (8, true) => ByteType
        case (16, true) => ShortType
        case (32, true) => IntegerType
        case (64, true) => LongType
        case (8, false) => ShortType
        case (16, false) => IntegerType
        case (32, false) => LongType
        case (64, false) => throw new IllegalArgumentException(
          s"uint64 field ${f.getName} has no lossless Spark type; refusing to wrap")
        case (w, s) => throw new IllegalArgumentException(s"unsupported int($w, signed=$s)")
      }
    case _: ArrowType.Date => DateType // day-unit; Spark dates are days
    case ts: ArrowType.Timestamp =>
      // all units normalize to microseconds (nanos floor). Zone-tagged
      // timestamps are instants (TimestampType); NAIVE ones are wall-clock
      // (TimestampNTZType) — conflating them shifts values by the session
      // zone offset
      if (ts.getTimezone == null) TimestampNTZType else TimestampType
    case t => throw new IllegalArgumentException(
      s"unsupported Arrow type $t for field ${f.getName}")
  }

  // ======================= write (export) =======================

  /**
   * GeoParquet-style `geo` schema-metadata document for a WKB geometry
   * column — the key the reference's own golden files carry and that
   * geopandas/geoarrow readers use to recognize the geometry column. Pass
   * the result in [[write]]'s `metadata` (`Map("geo" -> geoMetadata(...))`)
   * and [[crsOf]] round-trips it. `crsProjJson` is a PROJJSON document
   * (e.g. `crsOf` of a source file, carrying provenance through a
   * transform pipeline); omitted means crs null = the consumer's default
   * (OGC:CRS84 per the GeoParquet spec).
   */
  def geoMetadata(geometryCol: String = "geometry",
                  crsProjJson: Option[String] = None,
                  encoding: String = "WKB"): String = {
    val crs = crsProjJson.getOrElse("null")
    s"""{"version":"1.0.0","primary_column":${jsonText(geometryCol)},""" +
      s""""columns":{${jsonText(geometryCol)}:{"encoding":${jsonText(encoding)},""" +
      s""""crs":$crs,"geometry_types":[]}}}"""
  }

  /**
   * Export a DataFrame as Arrow IPC files — one `part-NNNNN.arrow` per
   * partition under `dir` (the parquet directory convention), so the write
   * is executor-parallel and the driver never sees the data. The output is
   * the reference ecosystem's wire format: `polars.read_ipc` /
   * `pyarrow.feather.read_table` open each part directly. Batches of
   * `batchRows` bound executor memory. Schema metadata (e.g. a GeoParquet
   * `geo` document for WKB geometry columns) rides on every part file.
   *
   * Types: string, binary, bool, byte/short/int/long, float/double,
   * timestamp (microsecond; zone-tagged instants AND naive NTZ wall-clock,
   * mirroring the read path's split), date — the mirror of the read subset.
   */
  def write(df: DataFrame, dir: String, batchRows: Int = 4096,
            metadata: Map[String, String] = Map.empty): Unit = {
    import org.apache.arrow.vector.types.pojo.{ArrowType => AT, FieldType, Schema => ASchema}
    val schema = df.schema
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val meta = metadata
    schema.fields.foreach(f => arrowTypeOf(f.dataType, f.name)) // fail fast pre-job
    val spark = df.sparkSession
    import spark.implicits._
    // the action IS the write; the per-partition row counts come back as the
    // job result (cheap observability, parquet-writer style)
    val counts = df.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val path = f"$dir/part-$pid%05d.arrow"
      val alloc = new RootAllocator()
      var written = 0L
      try {
        import scala.jdk.CollectionConverters._
        val fields = schema.fields.map { f =>
          new org.apache.arrow.vector.types.pojo.Field(f.name,
            new FieldType(f.nullable, arrowTypeOf(f.dataType, f.name), null, null), null)
        }.toSeq
        val aschema = new ASchema(fields.asJava, meta.asJava)
        val root = VectorSchemaRoot.create(aschema, alloc)
        // every resource closes on EVERY path: an unclosed root otherwise
        // makes the outer alloc.close() throw "Memory leaked", masking the
        // real failure (a bad value, a full disk) behind an allocator error
        try {
          val ch = new java.io.FileOutputStream(path).getChannel
          try {
            val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
            try {
              w.start()
              val buf = new Array[Row](batchRows)
              var n = 0
              def flush(): Unit = if (n > 0) {
                root.allocateNew()
                var c = 0
                while (c < schema.fields.length) {
                  val v = root.getVector(c)
                  var i = 0
                  while (i < n) { writeValue(v, i, buf(i), c); i += 1 }
                  v.setValueCount(n)
                  c += 1
                }
                root.setRowCount(n)
                w.writeBatch()
                written += n
                n = 0
              }
              while (rows.hasNext) {
                buf(n) = rows.next(); n += 1
                if (n == batchRows) flush()
              }
              flush()
              w.end()
            } finally w.close()
          } finally ch.close()
        } finally root.close()
      } finally alloc.close()
      Iterator.single(written)
    }.collect().sum
    require(counts >= 0L, "unreachable — materializes the write job")
  }

  private def arrowTypeOf(dt: DataType, name: String): ArrowType = dt match {
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case BooleanType => ArrowType.Bool.INSTANCE
    case ByteType => new ArrowType.Int(8, true)
    case ShortType => new ArrowType.Int(16, true)
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(
      org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(
      org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)
    case TimestampType => new ArrowType.Timestamp(
      org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC")
    // naive wall-clock timestamps: no zone tag (the read path's NTZ split)
    case TimestampNTZType => new ArrowType.Timestamp(
      org.apache.arrow.vector.types.TimeUnit.MICROSECOND, null)
    case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
    case other => throw new IllegalArgumentException(
      s"ArrowIpc.write: unsupported Spark type $other for column $name")
  }

  private def writeValue(v: FieldVector, i: Int, row: Row, c: Int): Unit = {
    if (row.isNullAt(c)) { setNull(v, i); return }
    v match {
      case x: VarCharVector => x.setSafe(i,
        row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case x: VarBinaryVector => x.setSafe(i, row.getAs[Array[Byte]](c))
      case x: BitVector => x.setSafe(i, if (row.getBoolean(c)) 1 else 0)
      case x: TinyIntVector => x.setSafe(i, row.getByte(c))
      case x: SmallIntVector => x.setSafe(i, row.getShort(c))
      case x: IntVector => x.setSafe(i, row.getInt(c))
      case x: BigIntVector => x.setSafe(i, row.getLong(c))
      case x: Float4Vector => x.setSafe(i, row.getFloat(c))
      case x: Float8Vector => x.setSafe(i, row.getDouble(c))
      case x: TimeStampMicroTZVector =>
        val inst = row.getAs[java.sql.Timestamp](c).toInstant
        x.setSafe(i, Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
          inst.getNano / 1000L))
      case x: TimeStampMicroVector => // NTZ: wall-clock micros, no zone
        val ldt = row.getAs[java.time.LocalDateTime](c)
        x.setSafe(i, Math.addExact(Math.multiplyExact(
          ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
          ldt.getNano / 1000L))
      case x: DateDayVector =>
        x.setSafe(i, row.getAs[java.sql.Date](c).toLocalDate.toEpochDay.toInt)
      case other => throw new IllegalArgumentException(
        s"ArrowIpc.write: unsupported vector ${other.getClass.getSimpleName}")
    }
  }

  private def setNull(v: FieldVector, i: Int): Unit = v match {
    case x: VarCharVector => x.setNull(i)
    case x: VarBinaryVector => x.setNull(i)
    case x: BitVector => x.setNull(i)
    case x: TinyIntVector => x.setNull(i)
    case x: SmallIntVector => x.setNull(i)
    case x: IntVector => x.setNull(i)
    case x: BigIntVector => x.setNull(i)
    case x: Float4Vector => x.setNull(i)
    case x: Float8Vector => x.setNull(i)
    case x: TimeStampMicroTZVector => x.setNull(i)
    case x: TimeStampMicroVector => x.setNull(i)
    case x: DateDayVector => x.setNull(i)
    case _ => throw new IllegalArgumentException("unsupported null vector")
  }
}
