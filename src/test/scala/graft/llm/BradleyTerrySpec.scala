package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand tournaments for the MM fit plus the planted-model gate at
  * sf0.001.
  */
class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  private def matchesOf(rows: (Long, Long, Long)*) =
    rows.toDF("i", "j", "win")

  test("lopsided tournament orders strengths A > B > C") {
    // A beats B 9:1, B beats C 9:1, A beats C 9:1
    val rows = Seq.tabulate(10)(k => (1L, 2L, if (k < 9) 1L else 2L)) ++
      Seq.tabulate(10)(k => (2L, 3L, if (k < 9) 2L else 3L)) ++
      Seq.tabulate(10)(k => (1L, 3L, if (k < 9) 1L else 3L))
    val fit = BradleyTerry.fitFromMatches(matchesOf(rows: _*), nRanked = false)
    assert(fit.llMonotone, s"lls: ${fit.lls.mkString(", ")}")
    val p = fit.strengths.get.as[(Long, Double)].collect().toMap
    assert(p(1L) > p(2L) && p(2L) > p(3L), s"order wrong: $p")
  }

  test("symmetric tournament fits equal strengths") {
    // every pair splits 5:5 — strengths must come out equal (geo-mean 1)
    val rows = (for {
      (a, b) <- Seq((1L, 2L), (2L, 3L), (1L, 3L))
      k <- 0 until 10
    } yield (a, b, if (k % 2 == 0) a else b))
    val fit = BradleyTerry.fitFromMatches(matchesOf(rows: _*), nRanked = false)
    val p = fit.strengths.get.as[(Long, Double)].collect().toMap
    p.values.foreach(v => assert(math.abs(v - 1.0) < 1e-6,
      s"balanced play must give unit strengths: $p"))
  }

  test("planted-model gate green at sf0.001") {
    val fit = BradleyTerry.fitEval(spark, "/root/testdata/sf0.001")
    assert(fit.llMonotone, s"MM decreased the likelihood: ${fit.lls}")
    assert(fit.spearmanPermille >= BradleyTerry.MinSpearmanPermille,
      s"recovery ${fit.spearmanPermille} under the floor")
    assert(fit.nItems == BradleyTerry.Items.toLong)
  }
}
