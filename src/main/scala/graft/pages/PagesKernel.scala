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

  def entityName(idx: Int): String = f"Entityville-$idx%04d"

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

  /** The html template. Tags + entities exercise extractText; the
   *  "near <Entity>" marker is the geocoding hook. */
  def html(id: Long, seed: Long): Array[Byte] = {
    val idx = entityIndex(id, seed)
    val lang = langOf(id, seed)
    val filler = langFiller(lang)
    val h = mix64(id * 2654435761L + seed)
    val nPara = 1 + java.lang.Long.remainderUnsigned(h, 4).toInt
    val sb = new java.lang.StringBuilder(512)
    sb.append("<html><head><title>Report ").append(id)
      .append("</title><style>body{margin:0}</style>")
      .append("<script>var x=1;</script></head><body>")
    sb.append("<h1>Dispatch &amp; notes from near ").append(entityName(idx)).append("</h1>")
    var p = 0
    while (p < nPara) {
      sb.append("<p>").append(filler).append(" segment ")
        .append(java.lang.Long.toUnsignedString(mix64(h + p))).append("</p>")
      p += 1
    }
    sb.append("</body></html>")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  // StaticInvoke-facing wrappers
  def synthUrl(id: Long, seed: Long): UTF8String = UTF8String.fromString(url(id, seed))
  def synthHtml(id: Long, seed: Long): Array[Byte] = html(id, seed)
  def synthLang(id: Long, seed: Long): UTF8String = UTF8String.fromString(langOf(id, seed))

  /** Extract the gazetteer entity mention from extracted text (the geocoding
   *  entity-extraction step); NULL if no mention. */
  def extractEntity(text: UTF8String): UTF8String = {
    val s = text.toString
    val i = s.indexOf("near Entityville-")
    if (i < 0) null
    else {
      val start = i + "near ".length
      val end = start + "Entityville-0000".length
      if (end <= s.length) UTF8String.fromString(s.substring(start, end)) else null
    }
  }
}
