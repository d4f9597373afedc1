package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.text.TextKernel

/** Hamming-distance relations behind the q_simhash gate strings: a one-word
 *  edit stays within a small ball of the original, unrelated text lands far
 *  away, duplicates collide exactly. */
class SimhashGateSpec extends AnyFunSuite {
  private val a = "the quick brown fox jumps over the lazy dog near the river bank"
  private val a2 = "the quick brown fox jumps over the lazy cat near the river bank"
  private val b = "entirely unrelated maritime insurance boilerplate concerning claims"

  private def sh(s: String): Long = TextKernel.simhash(UTF8String.fromString(s), 3)
  private def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)

  test("duplicate text -> identical simhash and fingerprint") {
    assert(sh(a) == sh(a))
    assert(TextKernel.fnv64(UTF8String.fromString(a)) ==
      TextKernel.fnv64(UTF8String.fromString(a)))
  }

  test("one-word edit stays near; unrelated text lands far") {
    val near = ham(sh(a), sh(a2))
    val far = ham(sh(a), sh(b))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 20, s"near=$near")
    assert(far >= 16, s"far=$far")
  }

  test("band completeness: any pair within hamming 7 shares a one-byte band " +
    "(the q_simhash_dedup candidate-generation guarantee)") {
    val rnd = new scala.util.Random(31337)
    def bands(sig: Long): Seq[Long] = (0 until 8).map(b => (sig >>> (b * 8)) & 0xff)
    for (_ <- 0 until 2000) {
      val x = rnd.nextLong()
      // flip 0..7 random bits — by pigeonhole at most 7 of 8 bands change
      val flips = rnd.nextInt(8)
      var y = x
      (0 until flips).foreach(_ => y ^= (1L << rnd.nextInt(64)))
      val shared = bands(x).zip(bands(y)).count { case (p, q) => p == q }
      assert(shared >= 1, s"x=$x flips=$flips no shared band")
    }
  }
}
