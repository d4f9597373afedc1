package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, LineString, LinearRing, MultiPolygon, Point, Polygon}

import graft.geom.Wkb

/**
 * ESRI Shapefile source/sink — the canonical OGR vector format behind the
 * reference's `read_file` (py-geopolars io/file.py:15-119; its own FID
 * docstring, file.py:83-87, names Shapefile's 0-based FIDs). Original
 * implementation from the public ESRI whitepaper (July 1998) and dBASE III
 * layout; no GDAL in this environment.
 *
 * Spark-first shape, mirroring [[ArrowIpc]]:
 *
 *  - READ parallelizes at RECORD-RANGE grain: the `.shx` index (8 bytes per
 *    record: offset + length) is one small driver-side read; executors then
 *    seek straight into `.shp`/`.dbf` for their contiguous slice, so one
 *    multi-gigabyte shapefile fans out across the cluster and per-task
 *    memory is bounded by its slice.
 *  - WRITE is executor-parallel: one `part-NNNNN.{shp,shx,dbf}` triple per
 *    partition under a directory (the parquet convention); each part is a
 *    complete valid shapefile that OGR/geopandas open directly.
 *
 * Geometry mapping (shapefile -> JTS -> canonical WKB):
 *   0 Null -> null geometry; 1/11/21 Point[ZM] -> Point;
 *   8/18/28 MultiPoint[ZM] -> MultiPoint;
 *   3/13/23 PolyLine[ZM] -> LineString (one part) | MultiLineString;
 *   5/15/25 Polygon[ZM] -> Polygon | MultiPolygon — outer rings are CW per
 *   spec, holes CCW; holes attach to the outer ring containing them.
 *   Z/M ordinates are dropped (the XY engine contract; `read_file`'s
 *   force_2d semantics, io/file.py:57-59).
 *
 * Attributes (dBASE III): C -> string, N/F -> long (no decimals) | double,
 * L -> boolean, D -> date. DBF stores numerics as fixed-width decimal TEXT —
 * an inherent format property (OGR shares it), so doubles survive only to
 * the emitted precision (17 significant digits here, lossless for every
 * double whose shortest repr fits).
 */
object Shapefile {

  // ---- shape type ids (ESRI whitepaper p.4) ----
  private final val NULL_SHAPE = 0
  private final val POINT = 1
  private final val POLYLINE = 3
  private final val POLYGON = 5
  private final val MULTIPOINT = 8

  /** base type of a possibly-Z/M shape id (Z = +10, M = +20). */
  private def baseType(t: Int): Int = if (t > 20) t - 20 else if (t > 10) t - 10 else t

  // ======================= read =======================

  /** Spark schema of a shapefile: dbf attributes + fid + geometry. */
  def schemaOf(pathNoExt: String): StructType = {
    val fields = readDbfHeader(pathNoExt + ".dbf")._3.map(f =>
      StructField(f.name, f.sparkType, nullable = true))
    StructType(StructField("fid", LongType, nullable = false) +:
      fields :+ StructField("geometry", BinaryType, nullable = true))
  }

  /** Record count from the `.shx` index (file length in the 100-byte
   *  big-endian header, minus the header, 8 bytes per record). */
  def recordCountOf(pathNoExt: String): Int = {
    val raf = new RandomAccessFile(pathNoExt + ".shx", "r")
    try {
      val head = new Array[Byte](100)
      raf.readFully(head)
      val buf = ByteBuffer.wrap(head).order(ByteOrder.BIG_ENDIAN)
      require(buf.getInt(0) == 9994, s"not a shapefile index: $pathNoExt.shx")
      val fileWords = buf.getInt(24) // 16-bit words incl. header
      (fileWords * 2 - 100) / 8
    } finally raf.close()
  }

  /**
   * Read one shapefile (pass the path without extension, or a directory of
   * part files written by [[write]]) as a DataFrame. `fid` is the 0-based
   * feature id (OGR's Shapefile convention, reference io/file.py:84-86).
   * Parallel grain: contiguous record ranges from the `.shx` index, one
   * range per task (`maxRecordsPerTask` bounds a task's slice).
   */
  /**
   * `skipFeatures`/`maxFeatures` are OGR `read_file`'s sequential
   * offset/limit (io/file.py:58-64) — meaningful here because a shapefile
   * HAS a physical record order. They push down into the `.shx` range
   * slicing: skipped/clipped records are never read, not filtered after.
   * `fid` stays the record's REAL file position (OGR semantics).
   */
  def read(spark: SparkSession, path: String,
           maxRecordsPerTask: Int = 65536,
           layer: Option[String] = None,
           skipFeatures: Long = 0L,
           maxFeatures: Option[Long] = None): DataFrame = {
    require(skipFeatures >= 0, "skipFeatures must be >= 0")
    val all = partBases(path)
    // OGR's Shapefile-directory model: a directory is a datasource with one
    // LAYER per .shp basename (reference read_file's `layer` param,
    // io/file.py:40-44); None reads every file (our part-file convention)
    val bases = layer match {
      case Some(l) =>
        val hit = all.filter(b => new java.io.File(b).getName == l)
        require(hit.nonEmpty,
          s"layer '$l' not found; available: ${all.map(new java.io.File(_).getName).mkString(", ")}")
        hit
      case None => all
    }
    require(bases.nonEmpty, s"no .shp files under $path")
    // a task reads its whole dbf slice in one buffer (recSize * count); a
    // wide schema (several C-254 fields -> multi-KB records) would turn the
    // 65536-record default into a multi-hundred-MB task buffer, so the
    // per-task record count is additionally clamped to a 64 MB dbf slice
    val headRecSize = 1 + readDbfHeader(bases.head + ".dbf")._3.map(_.length).sum
    val perTask = math.min(maxRecordsPerTask.toLong,
      math.max(1024L, (64L << 20) / math.max(1, headRecSize))).toInt
    val schema = schemaOf(bases.head)
    bases.tail.foreach(b => require(schemaOf(b) == schema,
      s"shapefile part $b schema differs from ${bases.head}"))
    // (base, firstRecord, count, fidBase): fids stay globally sequential
    // across parts in part order, like a single OGR layer. The global
    // [skipFeatures, skipFeatures + maxFeatures) window clips each file's
    // record range BEFORE task planning — skipped records are never read.
    val last = maxFeatures.map(m => skipFeatures + m)
    var fidBase = 0L
    val ranges = bases.flatMap { b =>
      val n = recordCountOf(b)
      val lo = math.max(0L, skipFeatures - fidBase)
      val hi = math.min(n.toLong, last.map(_ - fidBase).getOrElse(n.toLong))
      val rs =
        if (lo >= hi) Nil
        else (lo until hi by perTask.toLong).map { s =>
          (b, s.toInt, math.min(perTask.toLong, hi - s).toInt, fidBase + s)
        }
      fidBase += n
      rs
    }
    if (ranges.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val nSlices = math.max(1, math.min(ranges.size, spark.sparkContext.defaultParallelism))
    import spark.implicits._
    spark.createDataset(ranges).repartition(nSlices)
      .mapPartitions { iter =>
        iter.flatMap { case (base, first, count, fb) =>
          decodeRange(base, first, count, fb, schema)
        }
      }(Encoders.row(schema))
  }

  /** All part bases (path minus extension) under a path: a bare base, a
   *  `.shp` path, or a directory of part-*.shp. */
  private def partBases(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.getName.endsWith(".shp")).map(_.getPath.stripSuffix(".shp"))
        .sorted.toSeq
    else if (path.endsWith(".shp")) Seq(path.stripSuffix(".shp"))
    else Seq(path)
  }

  /** Decode one contiguous record range: one `.shx` slice read, then direct
   *  seeks into `.shp` and fixed-stride reads of `.dbf`. */
  private def decodeRange(base: String, first: Int, count: Int, fidBase: Long,
                          schema: StructType): Iterator[Row] = {
    val shx = new RandomAccessFile(base + ".shx", "r")
    val shp = new RandomAccessFile(base + ".shp", "r")
    val dbf = new RandomAccessFile(base + ".dbf", "r")
    try {
      // offsets of our records, from the index
      val idx = new Array[Byte](count * 8)
      shx.seek(100L + first * 8L)
      shx.readFully(idx)
      val ibuf = ByteBuffer.wrap(idx).order(ByteOrder.BIG_ENDIAN)
      val (nRec, headerSize, fields) = readDbfHeader(base + ".dbf")
      require(first + count <= nRec, s"dbf has $nRec records, need ${first + count}")
      val recSize = 1 + fields.map(_.length).sum
      val dbfBytes = new Array[Byte](recSize * count)
      dbf.seek(headerSize + first.toLong * recSize)
      dbf.readFully(dbfBytes)

      val out = new Array[Row](count)
      var i = 0
      while (i < count) {
        val offWords = ibuf.getInt(i * 8)
        val lenWords = ibuf.getInt(i * 8 + 4)
        val content = new Array[Byte](lenWords * 2)
        shp.seek(offWords * 2L + 8L) // skip 8-byte record header
        shp.readFully(content)
        val geom = decodeShape(ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN))
        val vals = new Array[Any](schema.length)
        vals(0) = fidBase + i
        var c = 0
        var pos = i * recSize + 1 // skip deletion flag
        while (c < fields.length) {
          val f = fields(c)
          vals(c + 1) = f.parse(dbfBytes, pos)
          pos += f.length
          c += 1
        }
        vals(schema.length - 1) = if (geom == null) null else Wkb.write(geom)
        out(i) = Row.fromSeq(vals.toIndexedSeq)
        i += 1
      }
      out.iterator
    } finally { shx.close(); shp.close(); dbf.close() }
  }

  /** One shape record's content -> JTS geometry (null for Null shapes). */
  private def decodeShape(b: ByteBuffer): Geometry = {
    val t = b.getInt(0)
    if (t == NULL_SHAPE) return null
    baseType(t) match {
      case POINT =>
        Wkb.factory.createPoint(new Coordinate(b.getDouble(4), b.getDouble(12)))
      case MULTIPOINT =>
        val n = b.getInt(36)
        val cs = new Array[Coordinate](n)
        var i = 0
        while (i < n) {
          cs(i) = new Coordinate(b.getDouble(40 + i * 16), b.getDouble(48 + i * 16))
          i += 1
        }
        Wkb.factory.createMultiPointFromCoords(cs)
      case POLYLINE =>
        val parts = readParts(b)
        if (parts.length == 1) Wkb.factory.createLineString(parts(0))
        else Wkb.factory.createMultiLineString(
          parts.map(Wkb.factory.createLineString))
      case POLYGON => assemblePolygon(readParts(b))
      case other => throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  /** Parts (rings) of a PolyLine/Polygon record: NumParts/NumPoints at
   *  bytes 36/40, part-start indexes, then XY pairs. */
  private def readParts(b: ByteBuffer): Array[Array[Coordinate]] = {
    val nParts = b.getInt(36)
    val nPts = b.getInt(40)
    val starts = (0 until nParts).map(i => b.getInt(44 + i * 4)) :+ nPts
    val ptBase = 44 + nParts * 4
    Array.tabulate(nParts) { p =>
      Array.tabulate(starts(p + 1) - starts(p)) { j =>
        val k = ptBase + (starts(p) + j) * 16
        new Coordinate(b.getDouble(k), b.getDouble(k + 8))
      }
    }
  }

  /** Shapefile polygon rings -> Polygon | MultiPolygon. Spec: outer rings
   *  CW, holes CCW; a hole belongs to the outer ring containing it. */
  private def assemblePolygon(parts: Array[Array[Coordinate]]): Geometry = {
    val rings = parts.map(Wkb.factory.createLinearRing(_))
    val (holes, shells) = rings.partition(r => Orientation.isCCW(r.getCoordinateSequence))
    if (shells.isEmpty) {
      // degenerate (all-CCW) file: treat the rings as shells, like OGR's
      // permissive reader
      if (holes.length == 1) return Wkb.factory.createPolygon(holes(0))
      return Wkb.factory.createMultiPolygon(holes.map(Wkb.factory.createPolygon))
    }
    val shellPolys = shells.map(Wkb.factory.createPolygon)
    val assigned = shells.map(_ => List.newBuilder[LinearRing])
    holes.foreach { h =>
      // r5 advice: a hole whose FIRST vertex lies on its shell's boundary
      // failed the interior-only contains test and was misattached to shell
      // 0. Probe a bounded number of vertices for one strictly interior to
      // a shell (the common case resolves on vertex 0, same cost as
      // before); if every probed vertex sits on boundaries, fall back to a
      // boundary-inclusive covers on vertex 0. The probe bound keeps a
      // degenerate all-boundary ring from costing O(vertices x shells).
      val nv = h.getNumPoints - 1
      var owner = -1
      var vi = 0
      while (owner < 0 && vi < math.min(nv, 8)) {
        owner = shellPolys.indexWhere(
          _.contains(Wkb.factory.createPoint(h.getCoordinateN(vi))))
        vi += 1
      }
      if (owner < 0)
        owner = shellPolys.indexWhere(
          _.covers(Wkb.factory.createPoint(h.getCoordinateN(0))))
      // hole outside every shell: keep the file readable, attach to shell 0
      assigned(math.max(owner, 0)) += h
    }
    val polys = shells.indices.map(i =>
      Wkb.factory.createPolygon(shells(i), assigned(i).result().toArray)).toArray
    if (polys.length == 1) polys(0) else Wkb.factory.createMultiPolygon(polys)
  }

  // ======================= dbf =======================

  private final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int) {
    def sparkType: DataType = ftype match {
      case 'C' => StringType
      case 'N' | 'F' => if (decimals == 0 && ftype == 'N') LongType else DoubleType
      case 'L' => BooleanType
      case 'D' => DateType
      case other => throw new IllegalArgumentException(s"unsupported dbf type '$other' ($name)")
    }
    def parse(rec: Array[Byte], pos: Int): Any = {
      val s = new String(rec, pos, length, StandardCharsets.ISO_8859_1).trim
      if (s.isEmpty) return null
      ftype match {
        case 'C' => s
        case 'N' => if (decimals == 0) s.toLong else s.toDouble
        case 'F' => s.toDouble
        case 'L' => s.charAt(0) match {
          case 'T' | 't' | 'Y' | 'y' => true
          case 'F' | 'f' | 'N' | 'n' => false
          case _ => null
        }
        case 'D' => java.sql.Date.valueOf(
          java.time.LocalDate.of(s.substring(0, 4).toInt,
            s.substring(4, 6).toInt, s.substring(6, 8).toInt))
      }
    }
  }

  /** (recordCount, headerSize, fields) from a dBASE III header. */
  private def readDbfHeader(path: String): (Int, Int, Array[DbfField]) = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val head = new Array[Byte](32)
      raf.readFully(head)
      val hb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
      val nRec = hb.getInt(4)
      val headerSize = hb.getShort(8) & 0xffff
      val nFields = (headerSize - 33) / 32
      val fdBytes = new Array[Byte](nFields * 32)
      raf.readFully(fdBytes)
      val fields = Array.tabulate(nFields) { i =>
        val o = i * 32
        var end = o
        while (end < o + 11 && fdBytes(end) != 0) end += 1
        DbfField(new String(fdBytes, o, end - o, StandardCharsets.ISO_8859_1),
          (fdBytes(o + 11) & 0xff).toChar,
          fdBytes(o + 16) & 0xff, fdBytes(o + 17) & 0xff)
      }
      (nRec, headerSize, fields)
    } finally raf.close()
  }

  // ======================= write =======================

  /**
   * Write a DataFrame with a WKB `geometry` column as a directory of
   * shapefile parts — one complete `part-NNNNN.{shp,shx,dbf}` triple per
   * partition, executor-parallel (the [[ArrowIpc.write]] convention; OGR
   * and geopandas open each part directly). All geometries in one part must
   * share a shape class (point / line / polygon / multipoint — the format
   * requires one shape type per file; Multi* of the same class is fine).
   * Attribute types: string (C), long (N 18), double (N 24.15, 17
   * significant digits), boolean (L), date (D).
   */
  def write(df: DataFrame, dir: String, geometryCol: String = "geometry"): Unit = {
    require(df.columns.contains(geometryCol),
      s"Shapefile.write needs a '$geometryCol' column")
    val schema = df.schema
    val gIdx = schema.fieldIndex(geometryCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != gIdx)
    attrs.foreach { case (f, _) => dbfSpec(f.dataType, f.name) } // fail fast
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val base = f"$dir/part-$pid%05d"
      Iterator.single(writePart(rows, base, schema, gIdx, attrs))
    }.collect().sum
    require(counts >= 0L, "unreachable — materializes the write job")
  }

  /** (type char, width, decimals) for an attribute column. N 20 holds every
   *  long incl. the sign of Long.MinValue (20 chars). */
  private def dbfSpec(dt: DataType, name: String): (Char, Int, Int) = dt match {
    case StringType => ('C', 254, 0)
    case LongType | IntegerType | ShortType | ByteType => ('N', 20, 0)
    case DoubleType | FloatType => ('N', 24, 15)
    case BooleanType => ('L', 1, 0)
    case DateType => ('D', 8, 0)
    case other => throw new IllegalArgumentException(
      s"Shapefile.write: unsupported attribute type $other for column $name")
  }

  /**
   * ONE streaming pass over the partition with bounded memory: the three
   * headers need totals (file length, bbox, shape type, record count) that
   * are only known at the end, so placeholder headers go out first and the
   * real ones are PATCHED over them when the stream is done — the standard
   * shapefile-writer shape (OGR does the same); no `rows.toArray`, a
   * billion-row partition streams through a few record buffers.
   */
  private def writePart(rows: Iterator[Row], base: String, schema: StructType,
                        gIdx: Int, attrs: Array[(StructField, Int)]): Long = {
    val specs = attrs.map { case (f, _) => dbfSpec(f.dataType, f.name) }
    val recSize = 1 + specs.map(_._2).sum
    val headerSize = 33 + attrs.length * 32
    // dbf header stores both as unsigned 16-bit — putShort would silently
    // wrap a very wide schema into a corrupt file
    require(recSize <= 0xffff, s"dbf record size $recSize exceeds the format's u16 limit")
    require(headerSize <= 0xffff, s"dbf header size $headerSize exceeds the format's u16 limit")

    var shapeType = NULL_SHAPE
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
    var n = 0
    var offWords = 50L

    val shpF = new RandomAccessFile(base + ".shp", "rw")
    val shxF = new RandomAccessFile(base + ".shx", "rw")
    val dbfF = new RandomAccessFile(base + ".dbf", "rw")
    try {
      shpF.setLength(0); shxF.setLength(0); dbfF.setLength(0)
      val shp = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new FileSection(shpF)))
      val shx = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new FileSection(shxF)))
      val dbf = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new FileSection(dbfF)))
      shp.write(new Array[Byte](100)) // placeholder headers, patched below
      shx.write(new Array[Byte](100))

      // dbf header: everything except the record count is known up front
      val hb = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
      hb.put(0, 3.toByte) // dBASE III, no memo
      hb.putShort(8, headerSize.toShort)
      hb.putShort(10, recSize.toShort)
      attrs.indices.foreach { i =>
        val o = 32 + i * 32
        val nm = attrs(i)._1.name.getBytes(StandardCharsets.ISO_8859_1)
        require(nm.length <= 10, s"dbf field name > 10 bytes: ${attrs(i)._1.name}")
        var j = 0
        while (j < nm.length) { hb.put(o + j, nm(j)); j += 1 }
        hb.put(o + 11, specs(i)._1.toByte)
        hb.put(o + 16, specs(i)._2.toByte)
        hb.put(o + 17, specs(i)._3.toByte)
      }
      hb.put(headerSize - 1, 0x0d.toByte) // field-descriptor terminator
      dbf.write(hb.array())

      val rec = new Array[Byte](recSize)
      rows.foreach { row =>
        val g = if (row.isNullAt(gIdx)) null else Wkb.read(row.getAs[Array[Byte]](gIdx))
        // a shapefile holds ONE shape class; a mixed partition must fail
        // loudly, never write a structurally corrupt file
        val t = shapeClassOf(g)
        if (t != NULL_SHAPE) {
          if (shapeType == NULL_SHAPE) shapeType = t
          else require(t == shapeType,
            s"mixed shape classes in one partition ($shapeType vs $t): " +
              "a shapefile holds one shape type — split by geometry class first")
          val e = g.getEnvelopeInternal
          if (!g.isEmpty) {
            minX = math.min(minX, e.getMinX); minY = math.min(minY, e.getMinY)
            maxX = math.max(maxX, e.getMaxX); maxY = math.max(maxY, e.getMaxY)
          }
        }
        val content = encodeShape(g, t)
        val words = content.length / 2
        shx.writeInt(offWords.toInt); shx.writeInt(words)
        shp.writeInt(n + 1); shp.writeInt(words) // record header, BE
        shp.write(content)
        offWords += 4 + words
        require(offWords * 2 <= Int.MaxValue.toLong * 2,
          s".shp part exceeds the format's 32-bit word offsets; write more partitions")

        java.util.Arrays.fill(rec, ' '.toByte)
        rec(0) = ' ' // not deleted
        var pos = 1
        attrs.indices.foreach { i =>
          val (tpe, width, dec) = specs(i)
          val (_, colIdx) = attrs(i)
          val s: String =
            if (row.isNullAt(colIdx)) ""
            else tpe match {
              case 'C' => row.get(colIdx).toString
              case 'N' if dec == 0 => row.get(colIdx) match {
                case l: Long => l.toString
                case nm: Number => nm.longValue().toString
              }
              case 'N' => fmtDouble(row.get(colIdx) match {
                case d: Double => d
                case nm: Number => nm.doubleValue()
              })
              case 'L' => if (row.getBoolean(colIdx)) "T" else "F"
              case 'D' =>
                val d = row.getAs[java.sql.Date](colIdx).toLocalDate
                f"${d.getYear}%04d${d.getMonthValue}%02d${d.getDayOfMonth}%02d"
            }
          val b = s.getBytes(StandardCharsets.ISO_8859_1)
          require(b.length <= width, s"value wider than dbf field (${attrs(i)._1.name}): $s")
          // text left-justified, numbers right-justified (dBASE convention)
          val start = if (tpe == 'C') pos else pos + width - b.length
          System.arraycopy(b, 0, rec, start, b.length)
          pos += width
        }
        dbf.write(rec)
        n += 1
      }
      dbf.write(0x1a) // EOF marker
      shp.flush(); shx.flush(); dbf.flush()

      // ---- patch the real headers ----
      if (minX > maxX) { minX = 0; minY = 0; maxX = 0; maxY = 0 }
      val h = ByteBuffer.allocate(100)
      def fillHeader(words: Long): Array[Byte] = {
        java.util.Arrays.fill(h.array(), 0.toByte)
        h.order(ByteOrder.BIG_ENDIAN)
        h.putInt(0, 9994)
        h.putInt(24, Math.toIntExact(words))
        h.order(ByteOrder.LITTLE_ENDIAN)
        h.putInt(28, 1000)
        h.putInt(32, shapeType)
        h.putDouble(36, minX); h.putDouble(44, minY)
        h.putDouble(52, maxX); h.putDouble(60, maxY)
        h.array()
      }
      shpF.seek(0); shpF.write(fillHeader(offWords))
      shxF.seek(0); shxF.write(fillHeader(50L + n * 4L))
      dbfF.seek(4)
      val cnt = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      cnt.putInt(0, n)
      dbfF.write(cnt.array())
    } finally { shpF.close(); shxF.close(); dbfF.close() }
    n.toLong
  }

  /** Append-only OutputStream view of a RandomAccessFile (so the same handle
   *  streams the body and then patches the header). */
  private final class FileSection(raf: RandomAccessFile) extends java.io.OutputStream {
    override def write(b: Int): Unit = raf.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit = raf.write(b, off, len)
  }

  /** Shape class id of a geometry (NULL_SHAPE for null/unsupported handled
   *  by the caller's encode). */
  private def shapeClassOf(g: Geometry): Int = g match {
    case null => NULL_SHAPE
    case _: Point => POINT
    case _: org.locationtech.jts.geom.MultiPoint => MULTIPOINT
    case _: LineString | _: org.locationtech.jts.geom.MultiLineString => POLYLINE
    case _: Polygon | _: MultiPolygon => POLYGON
    case other => throw new IllegalArgumentException(
      s"Shapefile.write: unsupported geometry ${other.getGeometryType}")
  }

  /** 17-significant-digit plain decimal — lossless for every double whose
   *  shortest repr fits the N(24,15) field. Extreme exponents (1e30,
   *  1e-300, ...) would expand far beyond 24 chars in plain form and abort
   *  the whole partition write at the width check (r5 advice); fall back to
   *  Java's scientific shortest repr for those — OGR accepts exponent text
   *  in N fields. */
  private def fmtDouble(d: Double): String = {
    val s = new java.math.BigDecimal(d, new java.math.MathContext(17))
      .stripTrailingZeros().toPlainString
    if (s.length <= 24) s else java.lang.Double.toString(d)
  }

  /** Shape-record content bytes (LE) for one geometry. */
  private def encodeShape(g: Geometry, shapeType: Int): Array[Byte] = {
    if (g == null || g.isEmpty) {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(0, NULL_SHAPE)
      return b.array()
    }
    g match {
      case p: Point =>
        val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(0, POINT)
        b.putDouble(4, p.getX); b.putDouble(12, p.getY)
        b.array()
      case mp: org.locationtech.jts.geom.MultiPoint =>
        val n = mp.getNumPoints
        val b = ByteBuffer.allocate(40 + n * 16).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(0, MULTIPOINT)
        putBox(b, mp)
        b.putInt(36, n)
        val cs = mp.getCoordinates
        cs.indices.foreach { i =>
          b.putDouble(40 + i * 16, cs(i).x); b.putDouble(48 + i * 16, cs(i).y)
        }
        b.array()
      case l: LineString => encodeParts(POLYLINE, l, Array(l.getCoordinates))
      case m: org.locationtech.jts.geom.MultiLineString =>
        encodeParts(POLYLINE, m, Array.tabulate(m.getNumGeometries)(
          i => m.getGeometryN(i).getCoordinates))
      case p: Polygon => encodeParts(POLYGON, p, polygonRings(p))
      case m: MultiPolygon =>
        encodeParts(POLYGON, m, (0 until m.getNumGeometries).flatMap(
          i => polygonRings(m.getGeometryN(i).asInstanceOf[Polygon])).toArray)
      case other => throw new IllegalArgumentException(
        s"Shapefile.write: unsupported geometry ${other.getGeometryType}")
    }
  }

  /** Rings of a polygon in shapefile orientation: shell CW, holes CCW. */
  private def polygonRings(p: Polygon): Array[Array[Coordinate]] = {
    def oriented(r: LineString, wantCCW: Boolean): Array[Coordinate] = {
      val cs = r.getCoordinates
      if (Orientation.isCCW(r.getCoordinateSequence) == wantCCW) cs else cs.reverse
    }
    oriented(p.getExteriorRing, wantCCW = false) +:
      Array.tabulate(p.getNumInteriorRing)(i =>
        oriented(p.getInteriorRingN(i), wantCCW = true))
  }

  private def encodeParts(tpe: Int, g: Geometry,
                          parts: Array[Array[Coordinate]]): Array[Byte] = {
    val nPts = parts.map(_.length).sum
    val b = ByteBuffer.allocate(44 + parts.length * 4 + nPts * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0, tpe)
    putBox(b, g)
    b.putInt(36, parts.length)
    b.putInt(40, nPts)
    var start = 0
    parts.indices.foreach { i =>
      b.putInt(44 + i * 4, start)
      start += parts(i).length
    }
    val ptBase = 44 + parts.length * 4
    var k = 0
    parts.foreach(_.foreach { c =>
      b.putDouble(ptBase + k * 16, c.x); b.putDouble(ptBase + k * 16 + 8, c.y)
      k += 1
    })
    b.array()
  }

  private def putBox(b: ByteBuffer, g: Geometry): Unit = {
    val e = g.getEnvelopeInternal
    b.putDouble(4, e.getMinX); b.putDouble(12, e.getMinY)
    b.putDouble(20, e.getMaxX); b.putDouble(28, e.getMaxY)
  }
}
