package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PAVA: textbook pooling cases, invariants (total/count preservation,
  * strictly increasing block means), and edge shapes. Pure-function
  * spec — no Spark session needed.
  */
class IsotonicSpec extends AnyFunSuite {

  private def means(blocks: Seq[(Long, Long)]): Seq[Double] =
    blocks.map { case (s, c) => s.toDouble / c }

  test("already monotone: every point is its own block") {
    val blocks = Isotonic.pava(Seq(1L, 2L, 3L, 4L))
    assert(blocks == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("single violator pools with its neighbor") {
    // 1, 3, 2 -> blocks (1), (3+2)/2
    val blocks = Isotonic.pava(Seq(1L, 3L, 2L))
    assert(blocks == Seq((1L, 1L), (5L, 2L)))
  }

  test("cascading violation pools backward through earlier blocks") {
    // 4, 3, 2, 1 -> one block of mean 2.5
    val blocks = Isotonic.pava(Seq(4L, 3L, 2L, 1L))
    assert(blocks == Seq((10L, 4L)))
  }

  test("equal means merge (strictness invariant)") {
    // 2, 2 would give two equal-mean blocks; PAVA merges them
    val blocks = Isotonic.pava(Seq(2L, 2L, 5L))
    assert(blocks == Seq((4L, 2L), (5L, 1L)))
  }

  test("invariants hold on a pseudo-random series") {
    val rnd = new scala.util.Random(13)
    val ys = Seq.fill(200)(rnd.nextInt(10000).toLong - 3000)
    val blocks = Isotonic.pava(ys)
    assert(blocks.map(_._1).sum == ys.sum)
    assert(blocks.map(_._2).sum == ys.length.toLong)
    val ms = means(blocks)
    assert(ms.zip(ms.tail).forall { case (a, b) => a < b },
      s"block means not strictly increasing: $ms")
  }

  test("negative values and single element") {
    assert(Isotonic.pava(Seq(-5L)) == Seq((-5L, 1L)))
    val blocks = Isotonic.pava(Seq(-1L, -4L))
    assert(blocks == Seq((-5L, 2L)))
  }
}
