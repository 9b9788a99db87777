package graft.llm

import graft.SparkSpec

/** κ/McNemar closed forms on hand cells plus the fixture gate. */
class ClassifierAgreementSpec extends SparkSpec {

  test("hand cells: perfect agreement κ=1; independence κ=0") {
    // perfect: b = c = 0
    val (k1, _) = ClassifierAgreement.finish(100, 60, 0, 0, 40)
    assert(k1 == 1000000L)
    // statistical independence: po == pe exactly -> κ = 0
    // cells 25/25/25/25: po = .5, pe = .5
    val (k0, chi0) = ClassifierAgreement.finish(100, 25, 25, 25, 25)
    assert(k0 == 0L)
    // McNemar with b=c: corrected (|0|-1)² -> clamped to 0? |b-c|=0,
    // num = -1 -> clamped 0
    assert(chi0 == 0L)
    // McNemar closed form: b=30, c=10 -> (19)²/40 = 9.025
    val (_, chi) = ClassifierAgreement.finish(100, 30, 30, 10, 30)
    assert(chi == 9025000L)
  }

  test("fixture gate: the two concept detectors agree beyond chance") {
    val (n, a, b, c, d) = ClassifierAgreement
      .cells(spark, "/root/testdata/sf0.001")
    val (kappa, chi2) = ClassifierAgreement.finish(n, a, b, c, d)
    info(s"n=$n a=$a b=$b c=$c d=$d kappa_micro=$kappa chi2_micro=$chi2")
    assert(n == a + b + c + d && n > 0)
    assert(kappa >= ClassifierAgreement.KappaCapMicro,
      s"kappa $kappa below cap")
  }
}
