package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** JVM-level contract for the aHash feature extractor behind q219 —
  * the invariances the gate's two planted classes rely on.
  */
class PerceptualHashSpec extends AnyFunSuite {
  import PerceptualHash._

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("re-encoded payload (header comment) hashes identically") {
    (0L until MediaBound).foreach { id =>
      assert(ahash(ppm16(id)) === ahash(reencoded(id)),
        s"re-encode changed the hash for id=$id")
    }
  }

  test("re-encoded payload bytes actually differ from the original") {
    assert(!java.util.Arrays.equals(ppm16(7L), reencoded(7L)))
  }

  test("brightness-scaled twin stays within HammingMax for >= floor of ids") {
    val dists = (0L until MediaBound).map(id =>
      hamming(ahash(ppm16(id)), ahash(scaled(id))))
    val within = dists.count(_ <= HammingMax)
    assert(within >= math.ceil(ScaledFloor * MediaBound),
      s"only $within/$MediaBound scaled twins within HammingMax " +
        s"(max observed ${dists.max})")
  }

  test("unrelated images are far apart") {
    val d = hamming(ahash(ppm16(3L)), ahash(ppm16(4L)))
    assert(d > HammingMax, s"distinct ids unexpectedly close: $d")
  }
}
