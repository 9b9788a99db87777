package graft.llm

import graft.SparkSpec

/** The SIGMOD'03 winnowing contracts: (a) any shared token run of
  * length ≥ w+k−1 produces ≥ 1 shared selected fingerprint, whatever
  * the surrounding text; (b) selection density is far below 1 (the
  * point of windowing); (c) unrelated random-ish texts share nothing.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(docs: Seq[(Long, String)]) =
    Winnowing.fingerprintsOf(docs.toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSeq

  test("shared run of w+k-1 tokens always yields a shared fingerprint") {
    // 6-token run embedded at different offsets in otherwise-disjoint
    // docs; winnowing guarantees a common fingerprint (mod-p doesn't).
    val run = "alpha beta gamma delta epsilon zeta"
    val a = s"x1 x2 x3 x4 $run y1 y2 y3"
    val b = s"z1 $run w1 w2 w3 w4 w5 w6 w7"
    val f = fps(Seq((1L, a), (2L, b)))
    val shared = f.filter(_._1 == 1L).map(_._2).toSet
      .intersect(f.filter(_._1 == 2L).map(_._2).toSet)
    assert(shared.nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("density: selected fingerprints are a strict minority of shingles") {
    val toks = (1 to 200).map(i => s"t${i * 7 % 97}").mkString(" ")
    val f = fps(Seq((1L, toks)))
    val nShingles = 200 - Winnowing.ShingleK + 1
    assert(f.size < nShingles / 2, s"${f.size} of $nShingles selected")
    assert(f.nonEmpty)
  }

  test("disjoint-vocabulary docs share no fingerprints") {
    val a = (1 to 50).map(i => s"a$i").mkString(" ")
    val b = (1 to 50).map(i => s"b$i").mkString(" ")
    val f = fps(Seq((1L, a), (2L, b)))
    val shared = f.filter(_._1 == 1L).map(_._2).toSet
      .intersect(f.filter(_._1 == 2L).map(_._2).toSet)
    assert(shared.isEmpty)
  }

  test("q377 pair report is non-empty and symmetric-free at sf0.001") {
    val rows = Winnowing.q377Winnowing(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (a, b, n) =>
      assert(a < b && n >= Winnowing.MinShared)
    }
  }
}
