package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.timestamp_seconds

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

  test("nearest as-of picks the closer side, ties backward, signed delta") {
    // id=1: only backward (t=100 vs r-b at 60) -> r-b, delta -40s worth
    // id=2: t=50 — backward r-a at 10 (40 away) vs forward r-b at 60
    //       (10 away) -> r-b, delta +10
    // id=3: t=10 — r-a at exactly 10 matches BOTH directions at
    //       distance 0 -> tie goes backward, delta 0
    // id=4: only forward (r-c at 7 >= 5) -> r-c, delta +2
    // id=5: unmatched -> dropped (inner)
    val tsLeft = left.withColumn("t", timestamp_seconds($"t"))
    val tsRight = right.withColumn("rt", timestamp_seconds($"rt"))
    val got = AsOfJoin.nearest(tsLeft, tsRight, Seq("key"),
        leftId = "id", leftTime = "t", rightTime = "rt")
      .orderBy("id")
      .select("id", "tag", "asof_delta_us")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "r-b", -40000000L),
      (2L, "r-b", 10000000L),
      (3L, "r-a", 0L),
      (4L, "r-c", 2000000L)))
  }
}
