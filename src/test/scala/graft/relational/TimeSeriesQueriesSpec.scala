package graft.relational

import java.sql.Timestamp

import graft.SparkSpec

/** Unit tests for resample + forward fill on a hand-computed fixture:
  * bucket-last selection (ties), gap filling, per-key grid bounds.
  */
class TimeSeriesQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def at(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("resampleFfill: last-per-bucket, gap fill, per-key spans") {
    val rows = Seq(
      // user 1: two obs in hour 10 (later ts wins), gap at 11, obs at 12
      (1L, at("10:05"), 1.0, 100L),
      (1L, at("10:40"), 2.0, 101L),
      (1L, at("12:10"), 9.0, 102L),
      // user 2: tie on ts within the bucket → higher event_id wins
      (2L, at("03:00"), 5.0, 200L),
      (2L, at("03:00"), 6.0, 201L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = TimeSeriesQueries.resampleFfill(rows, "user_id", "ts",
        "value", "event_id")
      .orderBy($"user_id", $"h")
      .as[(Long, Timestamp, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, at("10:00"), 2.0, true),   // last obs in the bucket
      (1L, at("11:00"), 2.0, false),  // gap forward-filled
      (1L, at("12:00"), 9.0, true),
      (2L, at("03:00"), 6.0, true)))  // ts tie → higher event_id
  }
}
