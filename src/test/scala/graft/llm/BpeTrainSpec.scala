package graft.llm

import graft.SparkSpec

/** Hand-traced BPE goldens (the Sennrich toy style) + greedy-fold
  * semantics checks.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def learn(texts: Seq[String], merges: Int) =
    BpeTrain.learnMerges(texts.toDF("text"), merges)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("hand-traced merge table on the low/lower/widest corpus") {
    // vocab: low:2 lower:1 widest:2 — traced by hand in the scaladoc
    // convention: tie-breaks are lexicographic on (left, right)
    val got = learn(Seq("low low lower widest widest"), 6)
    assert(got == Seq(
      (1, "l", "o", 3L),
      (2, "lo", "w", 3L),
      (3, "d", "e", 2L),
      (4, "de", "s", 2L),
      (5, "des", "t", 2L),
      (6, "i", "dest", 2L)))
  }

  test("merge application is greedy left-to-right without re-merging") {
    // "aaaaa" ×2: (a,a) counts 4 per word; greedy rewrite must give
    // [aa, aa, a] (NOT [aa, a, aa]), making iter-2 pairs
    // (aa,aa):2 and (aa,a):2 with (aa,a) winning the tie on right sym
    val got = learn(Seq("aaaaa aaaaa"), 3)
    assert(got == Seq(
      (1, "a", "a", 8L),
      (2, "aa", "a", 2L),
      (3, "aa", "aaa", 2L)))
  }

  test("words outside the [a-z0-9] alphabet are excluded") {
    val got = learn(Seq("ab ab x.y x.y x.y x.y"), 1)
    // x.y appears more often but is filtered; the only learnable merge
    // is (a,b) from "ab"
    assert(got == Seq((1, "a", "b", 2L)))
  }
}
