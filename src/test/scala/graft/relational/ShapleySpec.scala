package graft.relational

import graft.SparkSpec

/** Shapley attribution closed forms: a 2-channel hand game with known
  * values, plus the monotone-game (φ ≥ 0) and share-closure properties
  * on the fixture.
  */
class ShapleySpec extends SparkSpec {
  import spark.implicits._

  test("2-channel hand game matches the closed-form Shapley values") {
    // journeys: {A}→conv ×3, {B}→conv ×1, {A,B}→conv ×2
    // v(∅)=0 v(A)=3 v(B)=1 v(AB)=6; k!=2
    // 2φ_A = 1·(3−0) + 1·(6−1) = 8 ; 2φ_B = 1·(1−0) + 1·(6−3) = 4
    def journey(u: Long, chans: Seq[String]): Seq[(Long, Long, Long, String)] =
      chans.zipWithIndex.map { case (c, i) =>
        (u, i.toLong * 1000, u * 100 + i, c)
      } :+ ((u, chans.size.toLong * 1000, u * 100 + 99, "purchase"))
    val rows = journey(1, Seq("A")) ++ journey(2, Seq("A")) ++
      journey(3, Seq("A")) ++ journey(4, Seq("B")) ++
      journey(5, Seq("A", "B")) ++ journey(6, Seq("B", "A"))
    val out = JourneyQueries
      .shapleyOf(rows.toDF("user_id", "t_us", "event_id", "event_type"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq == Seq(("A", 8L), ("B", 4L)))
    assert(out.map(_._3).toSeq == Seq(666666L, 333333L))
  }

  test("fixture game is monotone and shares close to 10^6") {
    val out = JourneyQueries
      .q378Shapley(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (c, phi, share) =>
      assert(phi >= 0L, s"$c: negative marginal in a monotone game")
      assert(share >= 0L && share <= 1000000L)
    }
    val tot = out.map(_._3).sum
    assert(tot <= 1000000L && tot >= 1000000L - out.length,
      s"share closure violated: $tot")
  }
}
