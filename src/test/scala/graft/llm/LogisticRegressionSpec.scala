package graft.llm

import graft.SparkSpec

/** Descent and recoverability gates for the hashed-feature logistic
  * regression at sf0.001: monotone loss (convex objective + L2-unit
  * features + the pinned step size), real progress (final loss well
  * under ln 2), finite weights, and held-out accuracy above the
  * pinned floor.
  */
class LogisticRegressionSpec extends SparkSpec {

  lazy val fit: LogisticRegression.Fit =
    LogisticRegression.fitEval(spark, "/root/testdata/sf0.001")

  test("loss is monotone non-increasing across all iterations") {
    assert(fit.descentOk, s"losses: ${fit.losses.mkString(", ")}")
  }

  test("training makes real progress from the ln2 start") {
    assert(fit.losses.head > 0.69 && fit.losses.head < 0.6932,
      s"iteration 0 must start at ln 2 with zero weights: ${fit.losses.head}")
    assert(fit.losses.last < 0.5,
      s"final loss barely moved: ${fit.losses.last}")
  }

  test("weights finite, held-out accuracy over the pinned floor") {
    assert(fit.finiteOk)
    assert(fit.accPermille >= LogisticRegression.MinAccPermille,
      s"acc ${fit.accPermille} < ${LogisticRegression.MinAccPermille}")
  }

  test("gate frame is green and schema-stable") {
    val row = LogisticRegression
      .q321LogregGate(spark, "/root/testdata/sf0.001").collect().head
    assert(row.getAs[Boolean]("ok"), s"gate failed: $row")
    assert(row.getAs[Long]("dim") == LogisticRegression.HashDim.toLong)
  }
}
