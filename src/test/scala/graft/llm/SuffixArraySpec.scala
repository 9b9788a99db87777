package graft.llm

import graft.SparkSpec

/** Pins the prefix-doubling construction against the textbook
  * suffix array of "abracadabra$" (one char per token; '$' sorts
  * before letters in the token order, as in every SA paper's worked
  * example): SA = [11,10,7,0,3,5,8,1,4,6,9,2], so the rank of the
  * suffix at position 11 is 1 (1-based), at 10 is 2, … — construction
  * must reproduce it exactly.
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  test("prefix doubling reproduces the abracadabra$ suffix array") {
    val s = "abracadabra$"
    val stream = s.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toString) }
      .toDF("gpos", "tok")
    val (sa, _) = SuffixArray.saRanks(stream, s.length.toLong)
    val got = sa.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val saOrder = Seq(11, 10, 7, 0, 3, 5, 8, 1, 4, 6, 9, 2)
    val want = saOrder.zipWithIndex
      .map { case (p, r) => p.toLong -> (r + 1).toLong }.toMap
    assert(got == want, s"got $got")
  }

  test("denseRank is a dense 1-based rank over distinct keys") {
    val df = Seq((3L, 1L), (1L, 2L), (3L, 1L), (1L, 1L))
      .toDF("r1", "r2")
    val got = SuffixArray.denseRank(df, Seq("r1", "r2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 1L, (1L, 2L) -> 2L, (3L, 1L) -> 3L))
  }
}
