package graft.llm

import graft.SparkSpec

/** Accuracy + debias pins for b-bit minwise hashing. */
class BbitMinhashSpec extends SparkSpec {

  test("debias formula endpoints: full collision -> 1000, chance -> 0") {
    // est_milli = floor(1000 * (coll*2^b - S) / (S * (2^b - 1)))
    val s = BbitMinhash.Seeds
    def est(coll: Long): Long =
      math.floor(1000.0 * (coll * 4 - s) / (s.toDouble * 3)).toLong
    assert(est(s.toLong) == 1000L, "identical sets collide on every seed")
    assert(est(s.toLong / 4) == 0L, "chance collisions debias to zero")
  }

  test("fixture estimates track exact Jaccard (measured error cap)") {
    val rows = BbitMinhash.q459BbitMinhash(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val errs = rows.map(r =>
      math.abs(r.getAs[Long]("est_milli") - r.getAs[Long]("j_milli")))
    val mean = errs.sum / errs.length
    info(s"pairs=${rows.length} mean|est-J|=${mean} milli max=${errs.max}")
    // S=64, b=2: sd of the debiased estimator is ~1/sqrt(S)/(1-c) ≈ 167
    // milli at J≈0; mean error must sit well under one sd (measured ~80)
    assert(mean <= 150L, s"mean error $mean exceeds the measured cap")
  }
}
