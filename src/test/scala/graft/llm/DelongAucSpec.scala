package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DeLong structural components against a brute-force O(m·n) ψ-sum on
  * a hand frame (with ties planted on both classes), plus the fixture
  * gate.
  */
class DelongAucSpec extends SparkSpec {

  test("components match brute-force 2ψ sums, ties included") {
    import spark.implicits._
    // (doc_id, y, s): positives {5, 3, 3, 1}, negatives {4, 3, 2, 2, 0}
    // — a tie INSIDE the positive class, a cross-class tie at 3, and a
    // tie inside the negative class at 2.
    val rows = Seq(
      (1L, 1L, 5L), (2L, 1L, 3L), (3L, 1L, 3L), (4L, 1L, 1L),
      (10L, 0L, 4L), (11L, 0L, 3L), (12L, 0L, 2L), (13L, 0L, 2L),
      (14L, 0L, 0L))
    val df = rows.toDF("doc_id", "y", "s")
    val got = DelongAuc.components(df, "s")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pos = rows.filter(_._2 == 1L)
    val neg = rows.filter(_._2 == 0L)
    def psi2(x: Long, y: Long): Long = if (x > y) 2L else if (x == y) 1L else 0L
    pos.foreach { case (id, _, s) =>
      val want = neg.map(r => psi2(s, r._3)).sum
      assert(got(id) == ((1L, want)), s"v10_2 mismatch doc $id")
    }
    neg.foreach { case (id, _, s) =>
      val want = pos.map(r => psi2(r._3, s)).sum
      assert(got(id) == ((0L, want)), s"v01_2 mismatch doc $id")
    }
    // structural identity on the hand frame
    val sumPos = pos.map { case (_, _, s) => neg.map(r => psi2(s, r._3)).sum }.sum
    val sumNeg = neg.map { case (_, _, s) => pos.map(r => psi2(r._3, s)).sum }.sum
    assert(sumPos == sumNeg)
  }

  test("fixture gate: paired AUCs near ceiling, directional aucNB >= aucLR") {
    val (m, n, aucA, aucB, zAbs, idA, idB, varOk) =
      DelongAuc.delongStats(spark, "/root/testdata/sf0.001")
    info(s"m=$m n=$n aucNB=$aucA aucLR=$aucB |z|=$zAbs")
    assert(m > 0 && n > 0)
    assert(idA && idB, "exact structural identity must hold")
    assert(varOk)
    assert(aucA >= DelongAuc.AucFloorMicro && aucB >= DelongAuc.AucFloorMicro)
    // directional, not a non-significance cap: NB is perfect on the
    // planted concept by construction, so a real gap may turn
    // significant as the split grows (measured |z| ~30 at sf1)
    assert(aucA >= aucB)
    assert(zAbs >= 0L)
  }
}
