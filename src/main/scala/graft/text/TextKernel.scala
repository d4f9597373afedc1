package graft.text

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text-pipeline kernel: HTML text extraction, language id, fingerprints and
 * near-duplicate signatures over the `documents`/pages tables. All methods are
 * StaticInvoke targets (Catalyst-internal types, deterministic, no state).
 *
 * The per-row invariant from BASELINE.json input_hint — byte-identical
 * extracted `text` per `url` — is carried by `extractText` being a pure
 * function of the html bytes.
 */
object TextKernel {

  // ---------- html -> text (pure, deterministic) ----------

  /**
   * Strip tags (dropping script/style bodies), decode the few entities our
   * synthetic corpus uses, collapse whitespace runs to single spaces, trim.
   * Pure function of the bytes. Single-pass scanner — this runs once per page
   * in the hot generation path, so no regex and minimal allocation.
   */
  @inline private def regionEq(b: Array[Byte], i: Int, pat: Array[Byte]): Boolean = {
    if (i + pat.length > b.length) return false
    var k = 0
    while (k < pat.length) {
      // ASCII case-insensitive
      val c = b(i + k); val p = pat(k)
      if (c != p && (c | 0x20) != p) return false
      k += 1
    }
    true
  }

  private val pScript = "script".getBytes
  private val pStyle = "style".getBytes
  private val pEndScript = "</script".getBytes
  private val pEndStyle = "</style".getBytes
  private val pAmp = "&amp;".getBytes
  private val pLt = "&lt;".getBytes
  private val pGt = "&gt;".getBytes
  private val pQuot = "&quot;".getBytes
  private val pApos = "&#39;".getBytes
  private val pNbsp = "&nbsp;".getBytes

  private def indexOf(b: Array[Byte], from: Int, pat: Array[Byte]): Int = {
    var i = from
    val last = b.length - pat.length
    while (i <= last) {
      if (regionEq(b, i, pat)) return i
      i += 1
    }
    -1
  }

  // run-stop bytes ('<', '&', '\t', '\n', '\r' — NOT space) as a 256-entry
  // table: one load beats five compares in the per-byte run scan
  private val stopTable: Array[Boolean] = {
    val t = new Array[Boolean](256)
    Seq('<', '&', '\t', '\n', '\r').foreach(c => t(c.toInt) = true)
    t
  }

  // SWAR word scan (little-endian hosts): 0x80 marker in every byte of `w`
  // equal to `c` — the standard haszero(x ^ c*0x01…) trick, exact for all
  // byte values including >= 0x80
  private val swarOk =
    java.nio.ByteOrder.nativeOrder() == java.nio.ByteOrder.LITTLE_ENDIAN
  @inline private def eqMask(w: Long, c: Long): Long = {
    val y = w ^ (c * 0x0101010101010101L)
    (y - 0x0101010101010101L) & ~y & 0x8080808080808080L
  }

  def extractText(html: Array[Byte]): UTF8String = {
    // byte-level single pass: this is the per-page hot path, and UTF-8
    // multibyte sequences pass through untouched (all markup is ASCII)
    val n = html.length
    val out = new Array[Byte](n)
    var o = 0
    var i = 0
    var pendingSpace = false
    @inline def emit(c: Byte): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = true
      else {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = c; o += 1
      }
    }
    // a plain run may carry interior single spaces (the overwhelmingly common
    // shape of prose); it stops at markup/entity bytes, collapsible
    // whitespace, or a space not followed by a plain byte — those fall back
    // to the per-byte path above, so the output is byte-identical to it
    @inline def stopByte(c: Byte): Boolean = stopTable(c & 0xff)
    while (i < n) {
      val c0 = html(i)
      if (!stopByte(c0) && c0 != ' ') {
        var j = i + 1
        var run = true
        while (run && j < n) {
          // SWAR fast path: swallow plain bytes 8 at a time. An EVENT — the
          // thing the scalar loop must adjudicate — is a stop byte, or a
          // space whose follower is a stop byte or another space (the scalar
          // loop ends the run AT such a space, so it must not be skipped).
          // On an event the clean prefix is consumed (first event byte index
          // = ntz(mask)/8) and the scalar loop takes over at the event; a
          // trailing space whose follower is outside the word advances 7 so
          // it is re-examined with its follower.
          if (swarOk) {
            var fast = true
            while (fast && j + 8 <= n) {
              val w = org.apache.spark.unsafe.Platform.getLong(
                html, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + j)
              val mStop = eqMask(w, '<') | eqMask(w, '&') |
                eqMask(w, '\t') | eqMask(w, '\n') | eqMask(w, '\r')
              val mSp = eqMask(w, ' ')
              val events = mStop | (mSp & ((mStop | mSp) >>> 8))
              if (events != 0L) {
                j += java.lang.Long.numberOfTrailingZeros(events) >> 3
                fast = false
              } else if ((mSp & 0x8000000000000000L) != 0L) j += 7
              else j += 8
            }
          }
          if (j < n) {
            val c = html(j)
            if (stopByte(c)) run = false
            else if (c == ' ') {
              // interior single space stays in the run; a space before a stop
              // byte / another space / EOF must go through pendingSpace logic
              if (j + 1 < n && !stopByte(html(j + 1)) && html(j + 1) != ' ') j += 2
              else run = false
            } else j += 1
          } else run = false
        }
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        System.arraycopy(html, i, out, o, j - i)
        o += j - i
        i = j
      } else
      if (c0 == '<') {
        var close = i + 1
        while (close < n && html(close) != '>') close += 1
        if (close >= n) { i = n } // malformed trailing tag: drop rest
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
      } else if (c0 == '&') {
        // decode the entity set the corpus uses; unknown entities pass through
        if (regionEq(html, i, pAmp)) { emit('&'); i += 5 }
        else if (regionEq(html, i, pLt)) { emit('<'); i += 4 }
        else if (regionEq(html, i, pGt)) { emit('>'); i += 4 }
        else if (regionEq(html, i, pQuot)) { emit('"'); i += 6 }
        else if (regionEq(html, i, pApos)) { emit('\''); i += 5 }
        else if (regionEq(html, i, pNbsp)) { emit(' '); i += 6 }
        else { emit(c0); i += 1 }
      } else { emit(c0); i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  // ---------- language id (n-gram/stopword heuristic) ----------

  private val stopwordLangs: Array[String] = Array("de", "en", "es", "fr", "it")
  private val stopwordSets: Array[Array[String]] = Array(
    Array(" der ", " die ", " und ", " das ", " ist ", " nicht ", " ein "), // de
    Array(" the ", " and ", " of ", " to ", " in ", " is ", " that "),      // en
    Array(" el ", " la ", " los ", " que ", " de ", " es ", " una "),       // es
    Array(" le ", " la ", " et ", " les ", " des ", " est ", " une "),      // fr
    Array(" il ", " la ", " che ", " di ", " e ", " per ", " una "))        // it
  private val langResults: Array[UTF8String] =
    (stopwordLangs :+ "und").map(UTF8String.fromString)

  /** Heuristic language id: highest stopword-hit count wins; ties broken by
   *  language code order; "und" (undetermined) when nothing matches.
   *  Uses String.indexOf (SIMD intrinsic) — measured ~2x faster than a
   *  scalar byte scan, and this runs once per page in the hot path. */
  def langId(text: UTF8String): UTF8String = {
    // one padded+lowercased copy instead of three (toString, toLowerCase,
    // concat) — this runs per page in the hot generation path. ASCII fold is
    // correct here: stopword patterns are ASCII; non-ASCII chars never match.
    val src = text.toString
    val arr = new Array[Char](src.length + 2)
    arr(0) = ' '; arr(arr.length - 1) = ' '
    var i = 0
    while (i < src.length) {
      val c = src.charAt(i)
      arr(i + 1) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    val t = new String(arr)
    var best = stopwordLangs.length // "und"
    var bestScore = 0
    var l = 0
    while (l < stopwordSets.length) {
      val words = stopwordSets(l)
      var score = 0
      var i = 0
      while (i < words.length) {
        var idx = t.indexOf(words(i))
        while (idx >= 0) { score += 1; idx = t.indexOf(words(i), idx + 1) }
        i += 1
      }
      if (score > bestScore) { best = l; bestScore = score }
      l += 1
    }
    langResults(best)
  }

  // ---------- quality / token stats (single pass) ----------

  /**
   * One scan over the UTF-8 bytes replaces a regexp_replace per character
   * class (4 full string passes + pattern machinery) — this runs per
   * document in the 100 TB quality-scoring path. ASCII classes are safe on
   * raw bytes: UTF-8 continuation bytes are >= 0x80 and never match.
   * Fields: n_chars (codepoints), n_spaces, punct [.!?], uppers [A-Z],
   * digits [0-9].
   */
  def textStats(text: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = text.numBytes
    var spaces = 0L; var punct = 0L; var uppers = 0L; var digits = 0L
    var i = 0
    while (i < n) {
      val c = text.getByte(i)
      if (c == ' ') spaces += 1
      else if (c == '.' || c == '!' || c == '?') punct += 1
      else if (c >= 'A' && c <= 'Z') uppers += 1
      else if (c >= '0' && c <= '9') digits += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](text.numChars().toLong, spaces, punct, uppers, digits))
  }

  /**
   * BPE-ish token count: a deterministic scanner over the GPT-2-style
   * pre-tokenizer classes — ` ?letters+`, ` ?digits+`, ` ?other+`, and
   * whitespace runs (a single whitespace attaches to the following token;
   * longer runs contribute one whitespace token for the run minus the
   * attached char; a trailing run is one token). "Letters" are ASCII
   * [A-Za-z] plus any non-ASCII byte; contraction splits ('s, 'll, ...)
   * are not special-cased. Deliberately NOT a byte-pair vocabulary — it
   * counts pre-tokenizer pieces, the load-bearing number for length
   * filtering in a training-data pipeline.
   */
  def tokenCountBpe(text: UTF8String): Long = {
    val n = text.numBytes
    var i = 0
    var count = 0L
    @inline def isWs(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r'
    @inline def cls(c: Byte): Int =
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c < 0) 0 // letters
      else if (c >= '0' && c <= '9') 1
      else 2 // other (non-ws; ws handled separately)
    while (i < n) {
      val c = text.getByte(i)
      if (isWs(c)) {
        var j = i + 1
        while (j < n && isWs(text.getByte(j))) j += 1
        if (j == n) count += 1 // trailing whitespace run is one token
        else if (j - i > 1) count += 1 // run minus the attaching char
        i = j
      } else {
        val k = cls(c)
        var j = i + 1
        while (j < n && !isWs(text.getByte(j)) && cls(text.getByte(j)) == k) j += 1
        count += 1
        i = j
      }
    }
    count
  }

  // ---------- fingerprints ----------

  /** 64-bit FNV-1a — stable document fingerprint (rolling basis for shingles). */
  def fnv64(s: UTF8String): Long = fnv64Bytes(s.getBytes)

  def fnv64Bytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  private def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val tokenPattern = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  private def tokenize(text: String): Array[String] =
    tokenPattern.split(text.toLowerCase).filter(_.nonEmpty)

  /** FNV-1a over a token's chars continued from `h0` (avoids building the
   *  joined shingle string). */
  private def fnvToken(h0: Long, tok: String): Long = {
    var h = h0
    var i = 0
    while (i < tok.length) { h ^= (tok.charAt(i) & 0xffffL); h *= 0x100000001b3L; i += 1 }
    h ^= ' '.toLong; h * 0x100000001b3L
  }

  /** Hashes of word k-shingles (hash streamed across the window; no slice /
   *  string-join allocation in the hot path). */
  def shingleHashes(text: UTF8String, k: Int): Array[Long] = {
    val toks = tokenize(text.toString)
    if (toks.isEmpty) return Array.empty
    if (toks.length < k) {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < toks.length) { h = fnvToken(h, toks(i)); i += 1 }
      Array(h)
    } else {
      val res = new Array[Long](toks.length - k + 1)
      var i = 0
      while (i + k <= toks.length) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + k) { h = fnvToken(h, toks(j)); j += 1 }
        res(i) = h
        i += 1
      }
      res
    }
  }

  /**
   * MinHash signature: `numHashes` permutations simulated as
   * min(mix64(shingleHash ^ seed_i)). Empty text -> all Long.MaxValue.
   * Returned as ArrayData[Long] for Catalyst.
   */
  def minhash(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val hs = shingleHashes(text, k)
    val sig = new Array[Any](numHashes)
    var f = 0
    while (f < numHashes) {
      var m = Long.MaxValue
      var i = 0
      val seed = mix64(f.toLong * 0x9e3779b97f4a7c15L + 1)
      while (i < hs.length) {
        val v = mix64(hs(i) ^ seed)
        if (v < m) m = v
        i += 1
      }
      sig(f) = m
      f += 1
    }
    new GenericArrayData(sig)
  }

  /** One LSH band key: hash of signature slice [band*rowsPerBand, +rowsPerBand). */
  def minhashBand(text: UTF8String, k: Int, numHashes: Int, band: Int,
                  rowsPerBand: Int): Long = {
    val sig = minhash(text, k, numHashes)
    bandKey(sig, band, rowsPerBand, numHashes)
  }

  private def bandKey(sig: ArrayData, band: Int, rowsPerBand: Int, numHashes: Int): Long = {
    var h = 0xcbf29ce484222325L ^ band.toLong
    var i = band * rowsPerBand
    val end = math.min(numHashes, i + rowsPerBand)
    while (i < end) { h ^= sig.getLong(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** All LSH band keys at once — one signature computation per row instead of
   *  one per band (the per-band form recomputes the full MinHash each call). */
  def minhashBands(text: UTF8String, k: Int, numHashes: Int,
                   rowsPerBand: Int): ArrayData = {
    val sig = minhash(text, k, numHashes)
    val nBands = numHashes / rowsPerBand
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) { out(b) = bandKey(sig, b, rowsPerBand, numHashes); b += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over word-shingle hashes. */
  def simhash(text: UTF8String, k: Int): Long = {
    val hs = shingleHashes(text, k)
    val counts = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = mix64(hs(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Exact n-gram Jaccard similarity between two texts (refinement step after
   *  LSH candidate generation). */
  def jaccardShingles(a: UTF8String, b: UTF8String, k: Int): Double = {
    val sa = shingleHashes(a, k).toSet
    val sb = shingleHashes(b, k).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size.toDouble
      inter / (sa.size + sb.size - inter)
    }
  }

  // ---------- embeddings ----------

  /** Cosine similarity of two float vectors (ArrayData of FloatType). */
  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2Norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    while (i < a.numElements()) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** LSH bucket for cosine ANN: sign bits of `nBits` deterministic random
   *  hyperplanes (seeded by splitmix64 of (bit, dim)). */
  def cosineLshBucket(a: ArrayData, nBits: Int): Long = {
    var bucket = 0L
    var bit = 0
    while (bit < nBits) {
      var dot = 0.0
      var i = 0
      while (i < a.numElements()) {
        // deterministic pseudo-gaussian-ish weight in [-1,1)
        val w = (mix64(bit.toLong << 32 | i.toLong).toDouble / Long.MaxValue)
        dot += a.getFloat(i) * w
        i += 1
      }
      if (dot >= 0) bucket |= (1L << bit)
      bit += 1
    }
    bucket
  }

  /**
   * Multi-probe SRP-LSH: the query-side bucket set — the vector's own bucket
   * plus every bucket within Hamming distance `maxHamming` (1 or 2),
   * FLIPPING THE CLOSEST HYPERPLANES FIRST semantics simplified to all
   * flips (nBits is small). Probing only the query side keeps the data-side
   * layout single-bucket: recall rises ~(nBits+1)x candidate coverage while
   * the index stays one row per vector.
   */
  def cosineLshProbes(a: ArrayData, nBits: Int, maxHamming: Int): ArrayData = {
    val own = cosineLshBucket(a, nBits)
    val buf = new scala.collection.mutable.ArrayBuffer[Any](1 + nBits * nBits)
    buf += own
    if (maxHamming >= 1) {
      var i = 0
      while (i < nBits) { buf += (own ^ (1L << i)); i += 1 }
    }
    if (maxHamming >= 2) {
      var i = 0
      while (i < nBits) {
        var j = i + 1
        while (j < nBits) { buf += (own ^ (1L << i) ^ (1L << j)); j += 1 }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }

  // ---------- winnowing document fingerprints (rolling hash) ----------

  private def mix64w(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /**
   * Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
   * rolling-hash document-fingerprinting scheme MOSS uses): k-byte-gram
   * polynomial rolling hashes (base 257, mod 2^64 wraparound, finalized
   * through splitmix64 for selection uniformity), then window-minimum
   * selection over every w consecutive gram hashes, RIGHTMOST minimum per
   * window (the paper's robust-winnowing tie rule). Output: the distinct
   * selected hashes, ascending.
   *
   * Guarantee (paper, thm 2): two documents sharing any substring of at
   * least w + k - 1 bytes share at least one fingerprint — that makes the
   * selected set a position-independent containment signature where
   * MinHash-LSH (whole-document Jaccard) misses small copied passages.
   * Density: expected 2/(w+1) of the grams are selected, so the signature
   * is ~|doc| * 2/(w+1) longs regardless of duplication structure.
   */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    require(k >= 1 && w >= 1, "winnow needs k >= 1, w >= 1")
    val bytes = text.getBytes
    val n = bytes.length
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val B = 257L
    // B^(k-1) mod 2^64
    var bk = 1L
    var e = 0
    while (e < k - 1) { bk *= B; e += 1 }
    // gram hashes
    val grams = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    grams(0) = mix64w(h)
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xff) * bk) * B + (bytes(i + k - 1) & 0xff)
      grams(i) = mix64w(h)
      i += 1
    }
    // window minima, rightmost tie — a monotone deque gives O(n) but the
    // classic two-pointer re-scan is simpler and the re-scan triggers only
    // when the previous minimum falls out of the window (amortized ~O(n))
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var minIdx = 0
      var j = 1
      while (j < nGrams) {
        if (java.lang.Long.compareUnsigned(grams(j), grams(minIdx)) <= 0) minIdx = j
        j += 1
      }
      selected.add(grams(minIdx))
    } else {
      var minIdx = -1
      var start = 0
      while (start + w <= nGrams) {
        if (minIdx < start) {
          minIdx = start
          var j = start + 1
          while (j < start + w) {
            if (java.lang.Long.compareUnsigned(grams(j), grams(minIdx)) <= 0) minIdx = j
            j += 1
          }
          selected.add(grams(minIdx))
        } else {
          val incoming = start + w - 1
          if (java.lang.Long.compareUnsigned(grams(incoming), grams(minIdx)) <= 0) {
            minIdx = incoming
            selected.add(grams(minIdx))
          }
        }
        start += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }
}
