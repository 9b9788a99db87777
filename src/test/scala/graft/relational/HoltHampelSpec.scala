package graft.relational

import java.sql.Date

import graft.SparkSpec

/** Closed forms for the round-9 time-series additions: Holt with the
  * two-point init is EXACT on a linear series (l₁+b₁ = x₂ makes every
  * subsequent step reproduce the line, by induction), and the Hampel
  * screen repairs a single planted spike to the window median while a
  * flat series passes untouched.
  */
class HoltHampelSpec extends SparkSpec {
  import spark.implicits._

  private def daily(xs: Seq[Long], t: String = "a") =
    xs.zipWithIndex.map { case (x, i) =>
      (t, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), x)
    }.toDF("event_type", "day", "x")

  test("Holt is exact on a linear series: level=last, trend=slope, " +
    "forecast=next point") {
    // x_t = 1000 + 500·t, 12 points
    val xs = (0 until 12).map(t => 1000L + 500L * t)
    val row = TimeSeriesQueries.holtFold(daily(xs))
      .select("n_days", "level_micro", "trend_micro", "forecast_micro")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row == ((12L, xs.last * 1000000L, 500L * 1000000L,
      (xs.last + 500L) * 1000000L)), s"got $row")
  }

  test("Hampel repairs a planted spike to the window median; " +
    "flat neighborhoods untouched") {
    // steady 100s with one 100000 spike
    val xs = Seq.fill(5)(100L) ++ Seq(100000L) ++ Seq.fill(5)(100L)
    val rows = TimeSeriesQueries.hampelFilter(daily(xs))
      .select("x", "med", "is_outlier", "repaired")
      .as[(Long, Long, Boolean, Long)].collect()
    val spike = rows.filter(_._1 == 100000L)
    assert(spike.length == 1 && spike.head._3, "spike not flagged")
    assert(spike.head._4 == 100L, "spike not repaired to window median")
    // the steady rows: MAD = 0 and dev = 0 -> never flagged
    rows.filter(_._1 == 100L).foreach { r =>
      assert(!r._3 && r._4 == 100L, s"flat row flagged: $r")
    }
  }

  test("holt-winters exact fixpoints: constant and purely periodic series") {
    val m = TimeSeriesQueries.HwSeason
    // constant: l = C, b = 0, forecast = C — EXACT under dyadic steps
    val (lc, bc, fc) = TimeSeriesQueries.hwFold(Array.fill(30)(420.0), m)
    assert(lc == 420.0 && bc == 0.0 && fc == 420.0)
    // purely periodic: l = season mean, b = 0, forecast = next value —
    // the seasonal state absorbs the pattern exactly (each update's
    // correction term is 0 in exact dyadic arithmetic). Period values
    // are dyadic-friendly integers; mean 128 is exact.
    val p = Array(64.0, 96.0, 128.0, 160.0, 192.0, 128.0, 128.0)
    assert(p.sum / m == 128.0)
    val xs = Array.tabulate(30)(i => p(i % m))
    val (lp, bp, fp) = TimeSeriesQueries.hwFold(xs, m)
    assert(lp == 128.0, s"level $lp")
    assert(bp == 0.0, s"trend $bp")
    assert(fp == p(30 % m), s"forecast $fp != ${p(30 % m)}")
  }
}
