package graft.pages

import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic synthetic Common-Crawl-style page content
 * (BASELINE.json input_hint schema: url, warc_ts, html, text, lang).
 * Everything is a pure function of (id, seed) so the corpus is reproducible
 * at any scale factor and the extracted text is byte-identical per url across
 * runs — the pipeline's per-row invariant.
 */
object PagesKernel {

  private def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  val NumEntities = 512
  val NumHotEntities = 8

  /** Entity index for a page: ~25% of pages reference one of 8 "hot" entities
   *  (big cities) — the deliberate skew the salted join must absorb. */
  def entityIndex(id: Long, seed: Long): Int = {
    val h = mix64(id ^ mix64(seed))
    if (java.lang.Long.remainderUnsigned(h, 4) == 0)
      java.lang.Long.remainderUnsigned(mix64(h), NumHotEntities).toInt
    else
      java.lang.Long.remainderUnsigned(mix64(h), NumEntities).toInt
  }

  private val entityNames: Array[String] =
    Array.tabulate(NumEntities)(i => f"Entityville-$i%04d")
  def entityName(idx: Int): String = entityNames(idx) // Formatter is hot-path-slow

  /** Deterministic gazetteer position; lat in [-58,58], lon in [-170,170]. */
  def entityLat(idx: Int): Double = {
    val h = mix64(idx.toLong * 7919 + 13)
    -58.0 + (java.lang.Long.remainderUnsigned(h, 1000000).toDouble / 1000000.0) * 116.0
  }
  def entityLon(idx: Int): Double = {
    val h = mix64(idx.toLong * 104729 + 29)
    -170.0 + (java.lang.Long.remainderUnsigned(h, 1000000).toDouble / 1000000.0) * 340.0
  }

  private val langs = Array("en", "de", "fr", "es", "it")
  private val langFiller: Map[String, String] = Map(
    "en" -> "the quick study of maps and the shape of the world is a topic that matters to all",
    "de" -> "der schnelle blick auf die karte und das bild der welt ist ein thema das nicht klein ist",
    "fr" -> "le regard rapide sur la carte et les formes est un sujet qui compte pour une ville",
    "es" -> "el estudio de los mapas y la forma del mundo es una idea que importa a una ciudad",
    "it" -> "il rapido studio delle mappe e la forma del mondo e il tema che conta per una citta")

  def langOf(id: Long, seed: Long): String =
    langs(java.lang.Long.remainderUnsigned(mix64(id * 31 + seed), langs.length).toInt)

  def url(id: Long, seed: Long): String = {
    val h = mix64(id ^ (seed * 1013904223L))
    s"https://crawl-$seed.example.org/p/${java.lang.Long.toHexString(h)}/$id"
  }

  /** Minimal growable ASCII byte sink — the html builder is the hottest
   *  allocation site in the pipeline, so skip the StringBuilder->String->
   *  getBytes double copy (all template content is ASCII). */
  private final class ByteSink(cap: Int) {
    private var buf = new Array[Byte](cap)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def add(s: String): Unit = {
      ensure(s.length)
      var i = 0
      while (i < s.length) { buf(len) = s.charAt(i).toByte; len += 1; i += 1 }
    }
    // constant template fragments arrive pre-encoded: one arraycopy instead
    // of a per-char loop (the add(String) loop was ~9% of pipeline samples)
    def add(b: Array[Byte]): Unit = {
      ensure(b.length)
      System.arraycopy(b, 0, buf, len, b.length)
      len += b.length
    }
    // digits written straight into the buffer — Long.toString allocated a
    // String per call in the per-page hot path (profiled: addLong +
    // Long.getChars were top-10 leaf frames)
    private val dig = new Array[Byte](20)
    private def addDecimalUnsigned(v0: Long): Unit = {
      var v = v0
      if (v == 0) { ensure(1); buf(len) = '0'; len += 1; return }
      var n = 0
      while (v != 0) {
        dig(n) = ('0' + java.lang.Long.remainderUnsigned(v, 10)).toByte
        v = java.lang.Long.divideUnsigned(v, 10)
        n += 1
      }
      ensure(n)
      var i = n - 1
      while (i >= 0) { buf(len) = dig(i); len += 1; i -= 1 }
    }
    def addLong(v: Long): Unit =
      if (v < 0) { ensure(1); buf(len) = '-'; len += 1; addDecimalUnsigned(-v) }
      else addDecimalUnsigned(v)
    def addUnsigned(v: Long): Unit = addDecimalUnsigned(v)
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  // template fragments pre-encoded once (same bytes as the string literals
  // they replace — the byte-identical-text invariant is untouched)
  private val tHead = "<html><head><title>Report ".getBytes
  private val tHeadEnd =
    "</title><style>body{margin:0}</style><script>var x=1;</script></head><body>".getBytes
  private val tH1 = "<h1>Dispatch &amp; notes from near ".getBytes
  private val tH1End = "</h1>".getBytes
  private val tP = "<p>".getBytes
  private val tSeg = " segment ".getBytes
  private val tPEnd = "</p>".getBytes
  private val tEnd = "</body></html>".getBytes
  private val entityNameBytes: Array[Array[Byte]] = entityNames.map(_.getBytes)
  private val fillerBytes: Array[Array[Byte]] = langs.map(l => langFiller(l).getBytes)

  /** The html template. Tags + entities exercise extractText; the
   *  "near <Entity>" marker is the geocoding hook. */
  def html(id: Long, seed: Long): Array[Byte] = {
    val idx = entityIndex(id, seed)
    // same lang pick as langOf(id, seed), without the string->filler map hop
    val langIdx = java.lang.Long.remainderUnsigned(mix64(id * 31 + seed), langs.length).toInt
    val filler = fillerBytes(langIdx)
    val h = mix64(id * 2654435761L + seed)
    val nPara = 1 + java.lang.Long.remainderUnsigned(h, 4).toInt
    val sb = new ByteSink(640)
    sb.add(tHead); sb.addLong(id)
    sb.add(tHeadEnd)
    sb.add(tH1); sb.add(entityNameBytes(idx)); sb.add(tH1End)
    var p = 0
    while (p < nPara) {
      sb.add(tP); sb.add(filler); sb.add(tSeg)
      sb.addUnsigned(mix64(h + p)); sb.add(tPEnd)
      p += 1
    }
    sb.add(tEnd)
    sb.result()
  }

  // StaticInvoke-facing wrappers
  def synthUrl(id: Long, seed: Long): UTF8String = UTF8String.fromString(url(id, seed))
  def synthHtml(id: Long, seed: Long): Array[Byte] = html(id, seed)
  def synthLang(id: Long, seed: Long): UTF8String = UTF8String.fromString(langOf(id, seed))

  /** Extract the gazetteer entity mention from extracted text (the geocoding
   *  entity-extraction step); NULL if no mention. */
  private val nearMarker = "near Entityville-".getBytes
  private val nearLen = "near ".length
  private val entityLen = "Entityville-0000".length

  /**
   * Raw-byte first-byte-skip search + char-stepped slice. UTF8String.indexOf
   * runs a full pattern compare at every position; scanning for the
   * marker's first byte and comparing only on hits is ~2x on this path
   * (profiled at ~8% of the 32-core pipeline). Semantics are the
   * indexOf+substring CHAR-counted form — the marker is ASCII so a byte
   * match IS a char match, and the slice steps entityLen CHARS (not bytes),
   * clamping at the end like UTF8String.substring. NOTE this numChars
   * contract is intentional and differs from the pre-r3 numBytes gate on
   * non-ASCII input: a 16-char slice containing a multibyte char is now
   * accepted (the old code rejected any slice whose byte length != 16),
   * and a 15-char/16-byte tail is now rejected. The corpus entity is
   * always ASCII, so gate output is identical; the differential fuzz in
   * ExtractTextSpec checks against a numChars reference by design.
   */
  def extractEntity(text: UTF8String): UTF8String = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes
    val m = nearMarker.length
    val first = nearMarker(0)
    var i = 0
    val limit = n - m
    while (i <= limit) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == first) {
        var k = 1
        while (k < m &&
          org.apache.spark.unsafe.Platform.getByte(base, off + i + k) == nearMarker(k)) k += 1
        if (k == m) {
          // step entityLen CHARS from the entity start ("Entityville-...")
          val start = i + nearLen
          var p = start
          var chars = 0
          while (chars < entityLen && p < n) {
            p += UTF8String.numBytesForFirstByte(
              org.apache.spark.unsafe.Platform.getByte(base, off + p))
            chars += 1
          }
          if (chars < entityLen) return null // fewer than entityLen chars left
          // a multi-byte char that overruns the end still counts as one char
          // (UTF8String.substring clamps the same way)
          val end = math.min(p, n)
          val out = new Array[Byte](end - start)
          org.apache.spark.unsafe.Platform.copyMemory(base, off + start,
            out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, end - start)
          return UTF8String.fromBytes(out)
        }
      }
      i += 1
    }
    null
  }
}
