package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted trend+seasonal recovery: for x_t = 100·t + s_{t mod 7}, the
  * centered 7-day moving average removes the linear trend EXACTLY, so
  * the recovered per-dow seasonal must equal the planted pattern
  * mean-centered (s_d − s̄), to the last bit — detrending is integer
  * arithmetic and the only division is by exact small counts.
  */
class SeasonalDecomposeSpec extends SparkSpec {
  import spark.implicits._

  test("linear trend is removed exactly; planted weekly pattern recovered") {
    // 1970-01-01 is a Thursday = dow 0 under the epoch-mod-7 contract.
    val planted = Array(700.0, 1400.0, -2100.0, 0.0, 2800.0, -700.0, -2100.0)
    val mean = planted.sum / 7.0
    val days = (0 until 28).map { t =>
      val x = 100L * t + planted(t % 7).toLong
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(1970, 1, 1).plusDays(t).atStartOfDay()), x)
    }
    val daily = days.toDF("day", "x")
    val out = TimeSeriesQueries.decomposeDaily(daily)
      .select($"dow", $"n_days", $"seasonal")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.length == 7, s"all 7 dows present: ${out.mkString(",")}")
    // 28 days minus 3 edge days each side leaves 22 kept rows.
    assert(out.map(_._2).sum == 22L)
    out.foreach { case (dow, _, seasonal) =>
      val want = (planted(dow.toInt) - mean) / 100.0
      assert(math.abs(seasonal - want) < 1e-9,
        s"dow $dow: got $seasonal want $want")
    }
  }

  test("constant series decomposes to all-zero seasonal") {
    val days = (0 until 21).map { t =>
      (java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(1970, 1, 1).plusDays(t).atStartOfDay()), 500L)
    }
    val out = TimeSeriesQueries.decomposeDaily(days.toDF("day", "x"))
      .select(max(abs($"seasonal"))).as[Double].head()
    assert(out == 0.0, s"constant series must have zero seasonal: $out")
  }
}
