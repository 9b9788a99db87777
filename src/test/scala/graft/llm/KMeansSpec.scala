package graft.llm

import graft.SparkSpec

/** Hand-verifiable cases for the integer-exact distributed Lloyd's
  * iteration (q234): well-separated clusters recovered exactly,
  * deterministic refits, and the empty-cell inherit-previous rule.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def df(vs: Seq[(Long, Seq[Float])]) =
    vs.toDF("vec_id", "embedding")

  test("well-separated 2-D clusters converge to exact quantized means") {
    // init picks vec_ids 1..4 — one seed per natural cluster; the
    // remaining four vectors must join their nearest seed, and three
    // integer-exact iterations land on the per-pair floored means.
    val vecs = Seq(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(10.0f, 10.0f),
      3L -> Seq(-5.0f, 5.0f), 4L -> Seq(20.0f, -20.0f),
      5L -> Seq(0.1f, 0.0f), 6L -> Seq(10.1f, 10.0f),
      7L -> Seq(-5.0f, 5.1f), 8L -> Seq(20.0f, -20.2f))
    val out = KMeans.fitFrom(spark, df(vecs))
      .as[(Int, Int, Long, Long)].collect()
    assert(out.length == 8) // 4 cells × 2 dims
    assert(out.forall(_._4 == 2L), s"every cell should hold 2 vectors: ${out.toSeq}")
    val cent = out.map(r => (r._1, r._2) -> r._3).toMap
    def q(x: Double) = math.floor(x * 1e6).toLong
    // centroid = (q(a)+q(b)) / 2 (truncating, JVM = DuckDB //) per pair
    assert(cent((0, 0)) == (q(0.0) + q(0.1f.toDouble)) / 2)
    assert(cent((1, 0)) == (q(10.0) + q(10.1f.toDouble)) / 2)
    assert(cent((2, 1)) == (q(5.0) + q(5.1f.toDouble)) / 2)
    assert(cent((3, 1)) == (q(-20.0) + q(-20.2f.toDouble)) / 2)
  }

  test("empty cell keeps its initial centroid with n_vec = 0") {
    // vec 4 duplicates vec 1: distance ties break to the smaller cell,
    // so cell 3 never wins a vector and must carry its init centroid.
    val vecs = Seq(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(10.0f, 10.0f),
      3L -> Seq(-5.0f, 5.0f), 4L -> Seq(0.0f, 0.0f))
    val out = KMeans.fitFrom(spark, df(vecs))
      .as[(Int, Int, Long, Long)].collect()
    val byCell = out.groupBy(_._1)
    assert(byCell(3).forall(_._4 == 0L), "tied duplicate must go to cell 0")
    assert(byCell(3).map(r => r._2 -> r._3).toMap == Map(0 -> 0L, 1 -> 0L),
      "empty cell must keep its init centroid")
    assert(byCell(0).head._4 == 2L)
  }

  test("refit is deterministic on the fixture corpus") {
    val a = KMeans.fit(spark, "/root/testdata/sf0.001")
      .as[(Int, Int, Long, Long)].collect().toSeq
    val b = KMeans.fit(spark, "/root/testdata/sf0.001")
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(a == b, "k-means refit diverged across runs")
    assert(a.map(_._4).sum / KMeans.Dim > 0, "no vectors assigned")
  }
}
