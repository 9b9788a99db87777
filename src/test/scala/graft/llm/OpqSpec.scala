package graft.llm

import graft.SparkSpec

/** Pins for the OPQ alternation: Procrustes solve correctness and the
  * distortion gate on the fixture.
  */
class OpqSpec extends SparkSpec {

  private def matMul(a: Array[Array[Double]], b: Array[Array[Double]]) =
    Array.tabulate(a.length, b(0).length) { (i, j) =>
      (0 until b.length).map(t => a(i)(t) * b(t)(j)).sum
    }

  private def maxAbsDiff(a: Array[Array[Double]], b: Array[Array[Double]]) =
    a.zip(b).map { case (ra, rb) =>
      ra.zip(rb).map { case (x, y) => math.abs(x - y) }.max
    }.max

  test("procrustes of an orthogonal matrix recovers it exactly") {
    // M = R0 (orthogonal) ⇒ SVD has U·Vᵀ = R0; build R0 from two
    // Givens rotations in a 4-d space
    val d = 4
    def givens(p: Int, q: Int, th: Double) = {
      val g = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
      g(p)(p) = math.cos(th); g(q)(q) = math.cos(th)
      g(p)(q) = -math.sin(th); g(q)(p) = math.sin(th)
      g
    }
    val r0 = matMul(givens(0, 2, 0.7), givens(1, 3, -1.2))
    val got = Opq.procrustes(r0)
    assert(maxAbsDiff(got, r0) < 1e-9, "Procrustes must return R0 itself")
  }

  test("procrustes of a positive diagonal is the identity, and output is orthonormal") {
    val d = 5
    val m = Array.tabulate(d, d)((i, j) => if (i == j) (i + 1).toDouble else 0.0)
    val r = Opq.procrustes(m)
    val eye = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    assert(maxAbsDiff(r, eye) < 1e-9)
    // RᵀR = I for a general asymmetric input too
    val m2 = Array.tabulate(d, d)((i, j) => math.sin(i * 2.3 + j * 0.7))
    val r2 = Opq.procrustes(m2)
    val rtr = matMul(r2.transpose, r2)
    assert(maxAbsDiff(rtr, eye) < 1e-8, "output must be orthonormal")
  }

  test("q453 fixture gate: OPQ strictly beats PQ corpus distortion at sf0.001") {
    val rows = Opq.q453OpqRotation(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 500L)
    assert(rows(0).getBoolean(1),
      "OPQ corpus distortion must be strictly below PQ's")
  }

  test("q457 fixture gate: residual stage strictly refines one-stage VQ") {
    val rows = Opq.q457ResidualQuantization(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 500L)
    assert(rows(0).getBoolean(1),
      "two-stage RQ distortion must be strictly below one-stage")
  }
}
