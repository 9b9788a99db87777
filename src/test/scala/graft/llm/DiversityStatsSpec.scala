package graft.llm

import graft.SparkSpec

/** Diversity/drift invariants that hold by construction:
  * Good–Turing identities (Σ N_r = S_obs, Σ r·N_r = N), Chao1 ≥ S_obs,
  * coverage ∈ (0, 1], entropy ≤ ln(vocab), 0 ≤ JSD ≤ ln 2.
  */
class DiversityStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q371/q372: Good–Turing identities and Chao1 bounds hold") {
    val cc = DiversityStats.q371GoodTuring(spark, dir).collect()
    assert(cc.nonEmpty)
    val chao = DiversityStats.q372Chao1(spark, dir).collect().head
    val sObs = chao.getAs[Long]("s_obs")
    val nTot = chao.getAs[Long]("n_tot")
    assert(cc.map(_.getAs[Long]("n_r")).sum == sObs,
      "count-of-counts must partition the species set")
    assert(cc.map(r => r.getAs[Long]("r") * r.getAs[Long]("n_r")).sum == nTot,
      "Σ r·N_r must equal the token-trigram total")
    assert(chao.getAs[Long]("chao1_micro") >= sObs * 1000000L,
      "Chao1 must not estimate fewer species than observed")
    val cov = chao.getAs[Long]("coverage_micro")
    assert(cov > 0L && cov <= 1000000L, s"coverage out of (0,1]: $cov")
    // r* for the largest observed r is 0 (no N_{r+1} above it)
    val maxR = cc.maxBy(_.getAs[Long]("r"))
    assert(maxR.getAs[Long]("rstar_micro") == 0L)
  }

  test("q427: Theil decomposition closes — total ≈ between + within " +
    "to quantization loss") {
    val r = DiversityStats.q427TheilDecomposition(spark, dir)
      .collect().head
    val n = r.getAs[Long]("n_docs")
    val total = r.getAs[Long]("t_total_micro")
    val between = r.getAs[Long]("between_micro")
    val within = r.getAs[Long]("within_weighted_micro")
    // each emitted piece sums ≤ n_docs (+ sources) floored micro terms,
    // so the identity T = B + W must hold within that floor budget
    val tol = n + 25L
    assert(math.abs(total - (between + within)) <= tol,
      s"closure violated: $total vs $between + $within (tol $tol)")
    assert(between >= 0L && within >= 0L && total > 0L)
  }

  test("q373: entropy bounded by ln(vocab); JSD within [0, ln 2]") {
    val rows = DiversityStats.q373EntropyJsd(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("n_toks")
      val h = r.getAs[Long]("entropy_micro")
      val j = r.getAs[Long]("jsd_micro")
      val lnV = (math.log(v.toDouble) * 1e6).toLong
      // micro-quantization floors each term, so allow one micro per term
      assert(h > 0L && h <= lnV + v, s"entropy $h outside (0, ln $v]")
      assert(j >= -v && j <= 693148L + v, s"jsd $j outside [0, ln 2]")
    }
  }
}
