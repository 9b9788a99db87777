package graft.llm

import graft.SparkSpec

/** ALS recoverability gates at sf0.001: the regularized objective is
  * monotone across sweeps (the block-coordinate-descent theorem), the
  * rank-8 fit recovers the planted rank-2 value far better than the
  * global-mean baseline, and all factors stay finite.
  */
class AlsSpec extends SparkSpec {

  lazy val fit: Als.Fit = Als.fitEval(spark, "/root/testdata/sf0.001")

  test("regularized objective is monotone non-increasing") {
    assert(fit.monotone, s"objs: ${fit.objs.mkString(", ")}")
    assert(fit.objs.last < fit.objs.head * 0.5,
      s"second sweep should slash the objective: ${fit.objs.mkString(", ")}")
  }

  test("planted rank-2 structure recovered well under baseline") {
    assert(fit.ratioPermille <= Als.MaxRmseRatioPermille,
      s"rmse ${fit.rmse} vs baseline ${fit.baseRmse}: ${fit.ratioPermille}")
  }

  test("factors finite; gate row green") {
    assert(fit.finite)
    val row = Als.q328AlsGate(spark, "/root/testdata/sf0.001").collect().head
    assert(row.getAs[Boolean]("ok"), s"gate failed: $row")
    assert(row.getAs[Long]("rank") == Als.Rank.toLong)
  }

  test("deterministic: identical refit") {
    val a = Als.fitEval(spark, "/root/testdata/sf0.001")
    assert(a.nObs == fit.nObs && a.nUsers == fit.nUsers)
    // float sums reorder across runs; the gates must hold regardless
    assert(a.monotone && a.ratioPermille <= Als.MaxRmseRatioPermille)
  }
}
