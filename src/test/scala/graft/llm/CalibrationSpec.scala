package graft.llm

import graft.SparkSpec

/** Calibration: the quantized bin fold must reproduce hand-computed
  * Brier/ECE on a constructed frame (perfectly calibrated → ECE ~0;
  * anti-calibrated → large), and the q347 gate must hold at sf0.001.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("hand frame: Brier and ECE match the closed forms") {
    // 8 docs in bin 7 (p=0.75): 6 positives → frac_pos 0.75, gap 0;
    // 8 docs in bin 2 (p=0.25): 2 positives → gap 0. Perfect
    // calibration: ECE 0, Brier = mean p(1-p) = 0.1875.
    val rows = Seq.fill(6)((1.0, 0.75)) ++ Seq.fill(2)((0.0, 0.75)) ++
      Seq.fill(2)((1.0, 0.25)) ++ Seq.fill(6)((0.0, 0.25))
    val cells = Calibration.binCells(rows.toDF("y", "p"))
    assert(cells.map(_._1).sorted.toSeq == Seq(2L, 7L))
    assert(cells.map(_._2).sum == 16L)
    val (brier, ece) = Calibration.finish(cells)
    assert(brier == 187500L, s"brier $brier != 187500")
    assert(ece == 0L, s"perfectly calibrated frame read ECE $ece")
  }

  test("anti-calibrated frame: ECE reads the full gap") {
    // every doc scored 0.95 but only half are positive → gap 0.45
    val rows = Seq.fill(10)((1.0, 0.95)) ++ Seq.fill(10)((0.0, 0.95))
    val (brier, ece) = Calibration.finish(
      Calibration.binCells(rows.toDF("y", "p")))
    assert(ece == 449999L || ece == 450000L, s"ece $ece != ~450000")
    // Brier = (0.05² + 0.95²)/2 = 0.4525
    assert(math.abs(brier - 452500L) <= 1L, s"brier $brier")
  }

  test("q347 gate is green at sf0.001") {
    val (nTest, nPos, occupied, sumN, brier, base, ece) =
      Calibration.stats(spark, "/root/testdata/sf0.001")
    assert(sumN == nTest && occupied >= 2)
    assert(nPos > 0 && nPos < nTest)
    assert(brier < base, s"no skill: brier $brier >= base $base")
    assert(brier <= Calibration.BrierCapMilli * 1000L)
    assert(ece <= Calibration.EceCapMilli * 1000L)
  }

  test("q376 calibrated-threshold filter gate is green at sf0.001") {
    val (n, kept, tp, fp, fn) =
      Calibration.filterStats(spark, "/root/testdata/sf0.001")
    assert(kept > 0 && kept < n, s"degenerate filter: kept $kept of $n")
    assert(tp + fp == kept)
    assert(1000 * tp / kept >= Calibration.FilterPrecisionCapMilli)
    assert(1000 * tp / (tp + fn) >= Calibration.FilterRecallCapMilli)
  }

  test("q398 decile-lift gate is green at sf0.001") {
    import spark.implicits._
    val row = Calibration.q398DecileLift(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Boolean)].collect().head
    info(s"n_test=${row._1} n_pos=${row._2} ok=${row._3}")
    assert(row._3, "top-decile lift gate failed")
  }

  test("q353 isotonic recalibration improves both readings at sf0.001") {
    val (nCal, nTest, rawBrier, calBrier, rawEce, calEce) =
      Calibration.calibratedStats(spark, "/root/testdata/sf0.001")
    assert(nCal > 0 && nTest > 0)
    assert(calEce <= rawEce, s"ECE worsened: $rawEce -> $calEce")
    assert(calBrier <= rawBrier, s"Brier worsened: $rawBrier -> $calBrier")
    assert(calEce <= Calibration.CalEceCapMilli * 1000L)
  }
}
