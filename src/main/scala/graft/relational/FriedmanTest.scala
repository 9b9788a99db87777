package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** FRIEDMAN TEST (Friedman JASA'37 — the repeated-measures / blocked
  * rank test: "do the k treatments differ, judged WITHIN each block?"
  * Here: do the event types draw systematically different daily
  * revenue, judged within each day — the day is the block, so global
  * day-to-day traffic swings cancel instead of drowning the signal the
  * way they would in q519's unblocked Kruskal–Wallis): rank the k
  * types' revenues within every day, then test the per-type rank sums.
  *
  * Exactness: the (day × type) grid is DENSIFIED with 0-revenue cells
  * (complete blocks by construction — Friedman requires them); within-
  * block ties ride the DOUBLED-rank integers (rd = 2·avg-rank, the
  * q285 convention), so with the tie-general Conover form the whole
  * statistic is a ratio of exact BIGINTs: Q = (k−1)·Σ_j(S_j−n(k+1))² /
  * (Σ rd² − n·k·(k+1)²) where S_j = Σ_blocks rd (the 2× factors cancel
  * exactly). One shared formula string finishes the double + the
  * pinned χ²₄ 95% verdict.
  *
  * Scale shape: the corpus collapses to (type, day) in one partial
  * agg; all ranking runs on the CALENDAR-BOUNDED grid (q275/q292
  * admission — blocks are days, k is the fixed type cardinality), so
  * the test costs the same at 100 TB as at sf0.001 after the first
  * agg.
  */
object FriedmanTest {

  type Q = (SparkSession, String) => DataFrame

  /** χ²(k−1=4) 95% critical value, pinned literal (q519's). */
  val ChiSq4Crit = KruskalWallis.ChiSq4Crit

  val QFormula: String =
    "(CAST(k AS DOUBLE) - 1.0) * CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"

  val q521Friedman: Q = (s, dir) => {
    import s.implicits._
    friedman(T.events(s, dir)
      .groupBy($"event_type".as("t"), to_date($"ts").as("d"))
      .agg(sum(expr("CAST(FLOOR(100 * value) AS BIGINT)")).as("v")))
  }

  /** Densified complete-block grid with within-day DOUBLED tie-averaged
    * ranks: one row (d, t, rd) per (day × type) cell — shared by the
    * Friedman statistic and Page's trend test (q529).
    */
  private[relational] def rankedCells(dailyIn: DataFrame): DataFrame = {
    val s = dailyIn.sparkSession
    import s.implicits._
    val daily = dailyIn.localCheckpoint()
    // dense complete blocks: every (day, type) cell, 0 when absent
    val grid = daily.select($"d").distinct()
      .crossJoin(daily.select($"t").distinct())
      .join(daily, Seq("d", "t"), "left")
      .select($"d", $"t", coalesce($"v", lit(0L)).as("v"))
      .localCheckpoint()
    // doubled rank within each day block (tie-averaged ×2)
    val census = grid.groupBy($"d", $"v").agg(count(lit(1)).as("cnt"))
    val wDay = Window.partitionBy($"d").orderBy($"v")
    val rk = census.withColumn("rd",
      lit(2L) * coalesce(sum($"cnt")
        .over(wDay.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        + $"cnt" + 1L)
    grid.join(rk.select($"d", $"v", $"rd"), Seq("d", "v"))
      .select($"d", $"t", $"rd")
  }

  /** Tie-general Friedman over a `(t, d, v)` frame (densified to
    * complete blocks internally).
    */
  def friedman(dailyIn: DataFrame): DataFrame = {
    val s = dailyIn.sparkSession
    import s.implicits._
    val cells = rankedCells(dailyIn).localCheckpoint()
    val (nDays, k) = cells.agg(countDistinct($"d"), countDistinct($"t"))
      .as[(Long, Long)].head()
    val sums = cells.groupBy($"t").agg(sum($"rd").as("sj"))
    val num = sums
      .agg(sum(expr(s"CAST(sj - ${nDays}L * (${k}L + 1) AS DECIMAL(38,0)) " +
        s"* (sj - ${nDays}L * (${k}L + 1))")).cast("long"))
      .as[Long].head()
    val den = cells
      .agg(sum(expr("CAST(rd AS DECIMAL(38,0)) * rd")).cast("long"))
      .as[Long].head() - nDays * k * (k + 1) * (k + 1)
    Seq((nDays, k, num, den)).toDF("n_days", "k", "num", "den")
      .withColumn("q", expr(QFormula))
      .withColumn("reject_95", expr(s"$QFormula > $ChiSq4Crit"))
  }

  val q521Sql: String =
    s"""WITH daily AS MATERIALIZED (
      |  SELECT event_type AS t, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    CAST(SUM(CAST(FLOOR(100 * value) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |grid AS MATERIALIZED (
      |  SELECT dd.d, tt.t, COALESCE(daily.v, 0) AS v
      |  FROM (SELECT DISTINCT d FROM daily) dd
      |  CROSS JOIN (SELECT DISTINCT t FROM daily) tt
      |  LEFT JOIN daily ON daily.d = dd.d AND daily.t = tt.t),
      |census AS (SELECT d, v, COUNT(*) AS cnt FROM grid GROUP BY 1, 2),
      |rk AS (
      |  SELECT d, v, 2 * COALESCE(SUM(cnt) OVER (PARTITION BY d ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    + cnt + 1 AS rd
      |  FROM census),
      |cells AS MATERIALIZED (
      |  SELECT grid.d, grid.t, rk.rd FROM grid
      |  JOIN rk ON rk.d = grid.d AND rk.v = grid.v),
      |dims AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days,
      |  CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM grid),
      |sums AS (SELECT t, CAST(SUM(rd) AS BIGINT) AS sj FROM cells GROUP BY 1),
      |m AS (
      |  SELECT n_days, k,
      |    (SELECT CAST(SUM(CAST(sj - n_days * (k + 1) AS HUGEINT)
      |       * (sj - n_days * (k + 1))) AS BIGINT) FROM sums) AS num,
      |    (SELECT CAST(SUM(CAST(rd AS HUGEINT) * rd) AS BIGINT) FROM cells)
      |      - n_days * k * (k + 1) * (k + 1) AS den
      |  FROM dims)
      |SELECT n_days, k, num, den, $QFormula AS q,
      |  $QFormula > $ChiSq4Crit AS reject_95
      |FROM m""".stripMargin

  val queries: Map[String, Q] = Map(
    "q521_friedman" -> q521Friedman)
  val oracleSql: Map[String, String] = Map(
    "q521_friedman" -> q521Sql)
}
