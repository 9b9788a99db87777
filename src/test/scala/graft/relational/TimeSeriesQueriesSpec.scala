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

  test("q199 window EWMA equals the α=½ adjust-form recursion per user") {
    import org.apache.spark.sql.functions._
    val got = TimeSeriesQueries.q199EwmaExact(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // reference: per-user ordered replay of the textbook adjust=True
    // EWMA (numerator/denominator recursions), truncation-free — the
    // 40-lag window must agree within the sub-ulp truncation error.
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("double").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getDouble(3)))
    assert(events.nonEmpty && got.nonEmpty)
    events.groupBy(_._1).foreach { case (_, rows) =>
      var num = 0.0
      var den = 0.0
      rows.sortBy(r => (r._3.getTime, r._2)).foreach {
        case (user, event, _, v) =>
          num = num / 2 + v
          den = den / 2 + 1
          val want = num / den
          val gotV = got((user, event))
          assert(math.abs(gotV - want) <= 1e-9 * math.max(1.0, want),
            s"user $user event $event: got $gotV want $want")
      }
    }
  }
}
