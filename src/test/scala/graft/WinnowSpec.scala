package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.text.TextKernel

/** Winnowing fingerprints: the SIGMOD'03 guarantee (any shared substring of
 *  length >= w+k-1 shares a fingerprint), density, determinism, edges. */
class WinnowSpec extends SparkSpec {

  private def fps(s: String, k: Int = 8, w: Int = 6): Set[Long] = {
    val arr = TextKernel.winnow(UTF8String.fromString(s), k, w)
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  test("guarantee: planted shared passages of length >= w+k-1 always share") {
    val rnd = new scala.util.Random(99)
    val k = 8; val w = 6
    def randStr(n: Int) =
      Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    for (trial <- 0 until 100) {
      val passage = randStr(k + w - 1 + rnd.nextInt(30)) // >= guarantee length
      val docA = randStr(rnd.nextInt(120)) + passage + randStr(rnd.nextInt(120))
      val docB = randStr(rnd.nextInt(120)) + passage + randStr(rnd.nextInt(120))
      assert(fps(docA, k, w).intersect(fps(docB, k, w)).nonEmpty,
        s"trial $trial: no shared fingerprint for planted passage '$passage'")
    }
  }

  test("position independence: the same text shifted yields overlapping sets") {
    val doc = "the quick brown fox jumps over the lazy dog again and again and again"
    val shifted = "XYZZY PREFIX " + doc
    assert(fps(doc).intersect(fps(shifted)).nonEmpty)
    // determinism
    assert(fps(doc) == fps(doc))
  }

  test("density: at most one fingerprint per gram, at least one per w-window") {
    val doc = ("lorem ipsum dolor sit amet " * 20).trim
    val k = 8; val w = 6
    val nGrams = doc.length - k + 1
    val n = TextKernel.winnow(UTF8String.fromString(doc), k, w).numElements()
    assert(n >= 1 && n <= nGrams)
    // expected density 2/(w+1) of grams — allow a wide band, but repeated
    // text dedupes fingerprints, so only the upper side is meaningful here
    assert(n <= nGrams * 2 / (w + 1) + w)
  }

  test("edges: short and empty inputs; invalid params throw") {
    assert(fps("") == Set.empty)
    assert(fps("short", 8, 6) == Set.empty) // shorter than one gram
    assert(fps("exactly8", 8, 6).size == 1) // one gram -> one fingerprint
    assert(fps("exactly9!", 8, 6).size >= 1)
    intercept[IllegalArgumentException](
      TextKernel.winnow(UTF8String.fromString("x"), 0, 6))
    intercept[IllegalArgumentException](
      TextKernel.winnow(UTF8String.fromString("x"), 3, 0))
  }

  test("DSL: winnow_fingerprints evaluates inside a projection") {
    import org.apache.spark.sql.functions._
    import graft.functions.st._
    val n = spark.range(1)
      .select(size(winnow_fingerprints(
        lit("the quick brown fox jumps over the lazy dog"), lit(8), lit(6))))
      .head().getInt(0)
    assert(n >= 1)
  }
}
