package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 100L), // after u1's 2nd right row
    (2L, "u1", 50L),  // between u1's right rows
    (3L, "u1", 10L),  // exactly at u1's first right row (>= matches)
    (4L, "u2", 5L),   // before u2's only right row → unmatched
    (5L, "u3", 99L)   // key with no right rows → unmatched
  ).toDF("id", "key", "t")

  private def right = Seq(
    ("u1", 10L, "r-a"),
    ("u1", 60L, "r-b"),
    ("u2", 7L, "r-c")
  ).toDF("key", "rt", "tag")

  test("backward as-of picks latest right at-or-before left time") {
    val got = AsOfJoin.backward(left, right, Seq("key"), "t", "rt")
      .orderBy("id")
      .select("id", "tag").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "r-b"), (2L, "r-a"), (3L, "r-a")))
  }

  test("keepUnmatched keeps left rows with null payload") {
    val got = AsOfJoin.backward(left, right, Seq("key"), "t", "rt",
        keepUnmatched = true)
      .orderBy("id")
      .select("id", "tag").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.filter(_._2.isEmpty).map(_._1) == Seq(4L, 5L))
  }

  test("forward as-of picks earliest right at-or-after left time") {
    val got = AsOfJoin.forward(left, right, Seq("key"), "t", "rt")
      .orderBy("id")
      .select("id", "tag").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "r-b"), (3L, "r-a"), (4L, "r-c")))
  }
}
