package graft.llm

import graft.SparkSpec

/** Jacobi eigensolver: known small matrices, reconstruction of a random
  * symmetric matrix, determinism, and the end-to-end projected-variance
  * contract on Spark data with a planted low-rank covariance.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("known 2x2: eigenvalues and eigenvectors exact") {
    // [[2, 1], [1, 2]] -> eigenvalues 3, 1; vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(vecs(0)(0)) - s2) < 1e-12)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-12) // same sign
    assert(math.abs(vecs(1)(0) + vecs(1)(1)) < 1e-12) // opposite sign
  }

  test("reconstruction: W^T diag(l) W recovers a random symmetric matrix") {
    val rnd = new scala.util.Random(7)
    val d = 16
    val b = Array.fill(d, d)(rnd.nextGaussian())
    // a = b^T b: symmetric PSD
    val a = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(t => b(t)(i) * b(t)(j)).sum)
    val (vals, vecs) = Pca.jacobiEigen(a)
    // eigenvalues descending, nonnegative
    assert(vals.zip(vals.tail).forall { case (x, y) => x >= y - 1e-9 })
    assert(vals.forall(_ >= -1e-9))
    // sum_k l_k w_k w_k^T == a
    for (i <- 0 until d; j <- 0 until d) {
      val r = (0 until d).map(k => vals(k) * vecs(k)(i) * vecs(k)(j)).sum
      assert(math.abs(r - a(i)(j)) < 1e-8, s"recon ($i,$j): $r vs ${a(i)(j)}")
    }
    // orthonormal rows
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(t => vecs(i)(t) * vecs(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("determinism: identical input gives identical output") {
    val a = Array(
      Array(4.0, 1.0, 0.5), Array(1.0, 3.0, 0.25), Array(0.5, 0.25, 2.0))
    val r1 = Pca.jacobiEigen(a)
    val r2 = Pca.jacobiEigen(a)
    assert(r1._1.sameElements(r2._1))
    assert(r1._2.zip(r2._2).forall { case (x, y) => x.sameElements(y) })
  }

  test("planted low-rank covariance: top components recover the planted variances") {
    // x = 3*g1*u + 1*g2*w + noise*0: variance 9 along u, 1 along w
    val d = 8
    val u = Array.tabulate(d)(i => if (i == 2) 1.0 else 0.0)
    val w = Array.tabulate(d)(i => if (i == 5) 1.0 else 0.0)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(4000) {
      val g1 = rnd.nextGaussian() * 3.0
      val g2 = rnd.nextGaussian() * 1.0
      Array.tabulate(d)(i => (g1 * u(i) + g2 * w(i)).toFloat).toSeq
    }
    val df = rows.toDF("embedding")
    // run the same moments fold the q267 gate uses via a temp fixture:
    // covariance should be ~diag with 9 at dim 2 and 1 at dim 5
    val xs = df.select($"embedding".cast("array<double>")).as[Seq[Double]]
    val n = xs.count().toDouble
    val mean = xs.rdd.map(_.toArray).reduce((a, b) =>
      a.zip(b).map { case (x, y) => x + y }).map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    val gram = xs.rdd.map { x =>
      val g = Array.ofDim[Double](d * d)
      for (i <- 0 until d; j <- 0 until d) g(i * d + j) = x(i) * x(j)
      g
    }.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    for (i <- 0 until d; j <- 0 until d)
      cov(i)(j) = gram(i * d + j) / n - mean(i) * mean(j)
    val (vals, vecs) = Pca.jacobiEigen(cov)
    assert(math.abs(vals(0) - 9.0) < 0.8, s"top eigenvalue ${vals(0)} !~ 9")
    assert(math.abs(vals(1) - 1.0) < 0.2, s"second ${vals(1)} !~ 1")
    // residual components are float-roundoff of the planted zeros — the
    // fixture stores float32, so ~1e-5 relative noise is expected
    assert(vals.drop(2).forall(math.abs(_) < 1e-3))
    // top eigenvector concentrates on dim 2
    assert(math.abs(math.abs(vecs(0)(2)) - 1.0) < 1e-3)
  }
}
