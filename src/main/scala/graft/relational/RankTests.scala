package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** MANN–WHITNEY U rank-sum test (Wilcoxon two-sample — the
  * NONPARAMETRIC leg of the A/B readout next to q229's Welch t: no
  * normality assumption, robust to the heavy tails q110 winsorizes
  * away): variant = custkey mod 2 (the q229 assignment discipline),
  * metric = account balance in cents.
  *
  * Exactness discipline: tie-averaged ranks are half-integers, so the
  * whole computation runs on DOUBLED ranks — for a tied value block
  * `2·avgrank = 2·cum_before + cnt + 1`, an exact BIGINT — giving
  * `2·R₁ = Σ cntA·(2·cum_before + cnt + 1)` and
  * `2·U₁ = 2·R₁ − n₁(n₁+1)` with zero floats. Rank accounting runs
  * over DISTINCT metric values only (the q485/q90 order-statistic
  * discipline). The tie-corrected normal approximation
  * `z = (U₁ − n₁n₂/2) / √(n₁n₂/12·((n+1) − Σ(t³−t)/(n(n−1))))`
  * is evaluated from ONE SHARED SQL STRING ([[ZFormula]]) parsed by
  * both engines over the identical integer scalars — bit-identical
  * doubles by construction.
  */
object RankTests {

  type Q = (SparkSession, String) => DataFrame

  /** The z formula, shared verbatim by Spark and DuckDB. */
  val ZFormula: String =
    "(CAST(u1_x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) " +
      "/ 2.0 / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 * " +
      "((CAST(n1 + n2 AS DOUBLE) + 1.0) - CAST(ties AS DOUBLE) / " +
      "(CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0))))"

  /** The full test from any (variant, y) pool — public for the
    * planted-shift positive control in the spec.
    */
  def mwStats(pool: DataFrame): DataFrame = {
    val s = pool.sparkSession
    import s.implicits._
    val byVal = pool.groupBy($"y").agg(
      count(lit(1)).as("cnt"),
      sum(when($"variant" === 0L, 1L).otherwise(0L)).as("cnt_a"))
    val cumBefore = coalesce(sum($"cnt").over(
      Window.orderBy($"y").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val scalars = byVal.withColumn("cum_before", cumBefore)
      .agg(
        sum($"cnt_a").as("n1"),
        sum($"cnt" - $"cnt_a").as("n2"),
        sum($"cnt_a" * (lit(2L) * $"cum_before" + $"cnt" + lit(1L)))
          .as("r1_x2"),
        sum($"cnt" * $"cnt" * $"cnt" - $"cnt").as("ties"))
      .withColumn("u1_x2", $"r1_x2" - $"n1" * ($"n1" + 1L))
    scalars.select($"n1", $"n2", $"u1_x2", $"ties",
      expr(ZFormula).as("z"))
  }

  val q486MannWhitney: Q = (s, dir) => {
    import s.implicits._
    mwStats(T.customer(s, dir).select(
      ($"c_custkey" % 2L).as("variant"),
      expr("CAST(FLOOR(100 * c_acctbal) AS BIGINT)").as("y")))
  }

  val q486Sql: String =
    s"""WITH pool AS (
      |  SELECT c_custkey % 2 AS variant,
      |    CAST(FLOOR(100 * c_acctbal) AS BIGINT) AS y
      |  FROM customer),
      |byval AS (
      |  SELECT y, COUNT(*) AS cnt,
      |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cnt_a
      |  FROM pool GROUP BY 1),
      |ranked AS (
      |  SELECT *, COALESCE(SUM(cnt) OVER (ORDER BY y
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS cum_before
      |  FROM byval),
      |sc AS (
      |  SELECT CAST(SUM(cnt_a) AS BIGINT) AS n1,
      |    CAST(SUM(cnt - cnt_a) AS BIGINT) AS n2,
      |    CAST(SUM(cnt_a * (2 * cum_before + cnt + 1)) AS BIGINT) AS r1_x2,
      |    CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
      |  FROM ranked),
      |u AS (SELECT n1, n2, r1_x2 - n1 * (n1 + 1) AS u1_x2, ties FROM sc)
      |SELECT n1, n2, u1_x2, ties, $ZFormula AS z
      |FROM u""".stripMargin

  val queries: Map[String, Q] = Map(
    "q486_mann_whitney" -> q486MannWhitney)
  val oracleSql: Map[String, String] = Map(
    "q486_mann_whitney" -> q486Sql)
}
