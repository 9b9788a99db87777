package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Contracts for [[Skyline]]: the linear frontier scan equals the
  * O(n²) dominance definition on random data (including duplicate
  * points and tied axes), the distributed two-phase form equals the
  * brute-force answer regardless of partitioning, and the fixture
  * query output is its own skyline.
  */
class SkylineSpec extends SparkSpec {

  private def check(name: String, p: Prop, minTests: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def brute(
      pts: Seq[(Long, Double, Double)]): Set[(Long, Double, Double)] =
    pts.filter { p =>
      !pts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.toSet

  // a 10×10 integer grid forces duplicate points and tied axes
  private val pointGen: Gen[List[(Double, Double)]] = Gen.listOf(for {
    mn <- Gen.choose(0, 9)
    mx <- Gen.choose(0, 9)
  } yield (mn.toDouble, mx.toDouble))

  test("frontier scan equals brute-force dominance on random tied data") {
    check("scan-vs-brute", Prop.forAll(pointGen) { pts0 =>
      val pts = pts0.zipWithIndex
        .map { case ((mn, mx), i) => (i.toLong, mn, mx) }.toArray
      Skyline.frontierScan(pts).toSet == brute(pts.toSeq)
    })
  }

  test("two-phase distributed frontier is partitioning-invariant") {
    import spark.implicits._
    check("two-phase", Prop.forAll(pointGen, Gen.choose(1, 7)) {
      (pts0, nPart) =>
        pts0.isEmpty || {
          val pts = pts0.zipWithIndex
            .map { case ((mn, mx), i) => (i.toLong, mn, mx) }
          val df = pts.toDF("id", "mn", "mx").repartition(nPart)
          val got = Skyline.frontier2d(df, "id", "mn", "mx")
            .as[(Long, Double, Double)].collect().toSet
          got == brute(pts)
        }
    }, minTests = 10)
  }

  test("q198 fixture frontier is non-trivial and its own skyline") {
    val rows = Skyline.q198Skyline(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length < 100,
      s"frontier has ${rows.length} points")
    val all = rows.map(r => (r.getLong(0), r.getDouble(1),
      r.getInt(2).toDouble)).toSeq
    assert(brute(all) == all.toSet)
  }
}
