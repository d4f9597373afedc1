package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.pages.PagesKernel
import graft.text.TextKernel

/** Differential check of the run-copying extractText against the original
 *  per-byte scanner: outputs must be byte-identical on the full synthetic
 *  corpus shape and on adversarial whitespace/markup edges — this kernel
 *  carries the byte-identical-text-per-url invariant. */
class ExtractTextSpec extends AnyFunSuite {

  private def reference(html: Array[Byte]): String =
    new String(referenceBytes(html), java.nio.charset.StandardCharsets.UTF_8)

  /** The round-1 per-byte reference scanner, kept verbatim as the oracle. */
  private def referenceBytes(html: Array[Byte]): Array[Byte] = {
    def regionEq(b: Array[Byte], i: Int, pat: Array[Byte]): Boolean = {
      if (i + pat.length > b.length) return false
      var k = 0
      while (k < pat.length) {
        val c = b(i + k); val p = pat(k)
        if (c != p && (c | 0x20) != p) return false
        k += 1
      }
      true
    }
    val pScript = "script".getBytes; val pStyle = "style".getBytes
    val pEndScript = "</script".getBytes; val pEndStyle = "</style".getBytes
    val pAmp = "&amp;".getBytes; val pLt = "&lt;".getBytes; val pGt = "&gt;".getBytes
    val pQuot = "&quot;".getBytes; val pApos = "&#39;".getBytes; val pNbsp = "&nbsp;".getBytes
    def indexOf(b: Array[Byte], from: Int, pat: Array[Byte]): Int = {
      var i = from
      while (i <= b.length - pat.length) { if (regionEq(b, i, pat)) return i; i += 1 }
      -1
    }
    val n = html.length
    val out = new Array[Byte](n)
    var o = 0; var i = 0; var pendingSpace = false
    def emit(c: Byte): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = true
      else {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = c; o += 1
      }
    }
    while (i < n) {
      val c = html(i)
      if (c == '<') {
        var close = i + 1
        while (close < n && html(close) != '>') close += 1
        if (close >= n) { i = n }
        else {
          val isScript = regionEq(html, i + 1, pScript)
          val isStyle = regionEq(html, i + 1, pStyle)
          if (isScript || isStyle) {
            val endTag = if (isScript) pEndScript else pEndStyle
            val bodyEnd = indexOf(html, close + 1, endTag)
            i = if (bodyEnd < 0) n else {
              var gt = bodyEnd
              while (gt < n && html(gt) != '>') gt += 1
              if (gt >= n) n else gt + 1
            }
          } else i = close + 1
          pendingSpace = true
        }
      } else if (c == '&') {
        if (regionEq(html, i, pAmp)) { emit('&'); i += 5 }
        else if (regionEq(html, i, pLt)) { emit('<'); i += 4 }
        else if (regionEq(html, i, pGt)) { emit('>'); i += 4 }
        else if (regionEq(html, i, pQuot)) { emit('"'); i += 6 }
        else if (regionEq(html, i, pApos)) { emit('\''); i += 5 }
        else if (regionEq(html, i, pNbsp)) { emit(' '); i += 6 }
        else { emit(c); i += 1 }
      } else { emit(c); i += 1 }
    }
    java.util.Arrays.copyOf(out, o)
  }

  private def fast(b: Array[Byte]): String = TextKernel.extractText(b).toString

  test("identical to the reference on 5000 synthetic pages") {
    (0L until 5000L).foreach { id =>
      val html = PagesKernel.synthHtml(id, 42L)
      assert(fast(html) == reference(html), s"page $id diverged")
    }
  }

  test("identical on adversarial whitespace/markup edges") {
    val cases = Seq(
      "", " ", "  ", "a", " a", "a ", "a  b", "a b", "a\tb", "a\nb", "a \t b",
      "a <b>c</b> d", "a<b>c", "a &amp; b", "a &amp;&amp; b", "&amp;",
      "x &unknown; y", "a &nbsp; b", "a&nbsp;&nbsp;b", "tail &", "& head",
      "<p>a  b</p>", "<p> a </p><p>b</p>", "< notag", "a <",
      "<script>var x='<p>';</script>after", "<style>a{}</style>b",
      "<SCRIPT>X</SCRIPT>ok", "<script>never closed", "a b c d e f g",
      "ünïcode tëxt blåh <b>ökay</b>", "space before tag <b>x",
      "two  spaces   three", "a &lt;tag&gt; b", "quote &quot;q&#39; end",
      "&gt;", "word &a", "&ampX", "trailing space &amp; ")
    cases.foreach { s =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(fast(b) == reference(b), s"case '$s' diverged")
    }
  }

  test("identical on random byte soup (fuzz)") {
    val rnd = new scala.util.Random(4242)
    val alphabet = "ab <>&;/tsclripyef\t\n\r  &amp;&lt;&nbsp;<script></script><style></style>"
    (0 until 3000).foreach { k =>
      val len = rnd.nextInt(120)
      val s = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(fast(b) == reference(b), s"fuzz #$k '${s.take(80)}' diverged")
    }
  }

  test("identical on fully random bytes (incl. invalid UTF-8)") {
    val rnd = new scala.util.Random(77)
    (0 until 1500).foreach { k =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      // compare raw bytes — invalid UTF-8 must survive the scanner untouched
      assert(java.util.Arrays.equals(TextKernel.extractText(b).getBytes,
        referenceBytes(b)), s"raw fuzz #$k diverged")
    }
  }

  test("UTF8String round trip preserves bytes exactly") {
    val html = PagesKernel.synthHtml(7L, 42L)
    val a = TextKernel.extractText(html)
    val b = TextKernel.extractText(html)
    assert(java.util.Arrays.equals(a.getBytes, b.getBytes))
  }

  test("extractEntity raw-byte search is identical to the indexOf/substring reference") {
    // the old implementation, kept verbatim as the differential reference
    val marker = org.apache.spark.unsafe.types.UTF8String.fromString("near Entityville-")
    def reference(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
      val i = text.indexOf(marker, 0)
      if (i < 0) null
      else {
        val slice = text.substring(i + 5, i + 5 + 16)
        if (slice.numChars == 16) slice else null
      }
    }
    def check(s: String): Unit = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val got = PagesKernel.extractEntity(u)
      val exp = reference(u)
      assert((got == null) == (exp == null) && (got == null || got.equals(exp)),
        s"mismatch on '$s': got=$got exp=$exp")
    }
    // crafted edges: absent, exact fit, truncated tails, multibyte tails,
    // marker at start/end, repeated markers, continuation-byte noise
    Seq(
      "no mention at all", "", "near Entity", "near Entityville-",
      "x near Entityville-0042 y", "near Entityville-0042",
      "near Entityville-004", "near Entityville-00é", "near Entityville-12é",
      "near Entityville-12é3", "tail near Entityville-é042 and more",
      "near Entityville-0042 near Entityville-9999",
      "ünïcödé before near Entityville-0007 after",
      "nnnnear Entityville-1234", "near near Entityville-5678").foreach(check)
    // fuzz: random ASCII+multibyte soup with markers spliced at random spots
    val rnd = new scala.util.Random(61)
    val alphabet = "abc néüé中 xyz0123-"
    (0 until 3000).foreach { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(60)).foreach(_ => sb.append(alphabet(rnd.nextInt(alphabet.length))))
      if (rnd.nextBoolean()) {
        sb.append("near Entityville-")
        (0 until rnd.nextInt(6)).foreach(_ => sb.append(alphabet(rnd.nextInt(alphabet.length))))
      }
      (0 until rnd.nextInt(20)).foreach(_ => sb.append(alphabet(rnd.nextInt(alphabet.length))))
      check(sb.toString)
    }
  }
}
