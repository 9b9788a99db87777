package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** SPLIT-CONFORMAL PREDICTION intervals (Vovk et al.; Lei et al.
  * JASA'18 — the distribution-free uncertainty wrapper modern ML
  * serving puts around ANY point predictor): a calibration split
  * measures nonconformity `s = |y − ŷ|`, and
  * `q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest s` makes `ŷ ± q̂` a
  * marginal (1−α) prediction interval for exchangeable data.
  *
  * Instantiation (everything BIGINT, zero doubles):
  *   - y = order total in cents (`⌊100·o_totalprice⌋`);
  *   - predictor ŷ = the calibration split's per-`o_orderpriority`
  *     integer mean (`sum DIV count` — any fixed point predictor works,
  *     conformal wraps it unchanged);
  *   - cal/test split = md5 coin on the order key (q95 discipline —
  *     engine-independent, so DuckDB rebuilds the identical split);
  *   - q̂ via distributed rank arithmetic: distinct-score counts,
  *     running sum in score order, first score whose cumulative count
  *     reaches k = (9·(n_cal+1)+9) DIV 10 (α = 0.1) — the window runs
  *     over DISTINCT score values only (q90's order-statistic
  *     discipline), never the raw rows.
  *
  * The oracle replays split, predictor, q̂, and test coverage exactly;
  * the spec additionally pins the conformal GUARANTEE direction
  * (coverage close to 1−α from above at these n).
  */
object Conformal {

  type Q = (SparkSession, String) => DataFrame

  /** Miscoverage level α = 1/10. */
  val AlphaPermille = 100L

  /** (cal, test) frames of (grp, y_cents). */
  private def splits(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val base = T.orders(s, dir).select(
      $"o_orderpriority".as("grp"),
      expr("CAST(FLOOR(100 * o_totalprice) AS BIGINT)").as("y"),
      (conv(substring(md5(concat(lit("cp:"),
        $"o_orderkey".cast("string"))), 1, 4), 16, 10)
        .cast("long") % 2L).as("coin"))
    (base.filter($"coin" === 0L).drop("coin"),
      base.filter($"coin" === 1L).drop("coin"))
  }

  val q485Conformal: Q = (s, dir) => {
    import s.implicits._
    val (cal, test) = splits(s, dir)
    // point predictor: per-group integer mean on the calibration split
    val model = cal.groupBy($"grp")
      .agg(expr("sum(y) div count(1)").as("yhat"))
    val calScores = cal.join(broadcast(model), "grp")
      .select(abs($"y" - $"yhat").as("score")).localCheckpoint()
    val nCal = calScores.count()
    val k = (9L * (nCal + 1L) + 9L) / 10L
    // q̂ = k-th smallest score: cumulative counts over DISTINCT scores
    val qhat = calScores.groupBy($"score").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(
        Window.orderBy($"score").rowsBetween(Window.unboundedPreceding, 0)))
      .filter($"cum" >= k)
      .agg(min($"score")).as[Long].head()
    val cov = test.join(broadcast(model), "grp")
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs($"y" - $"yhat") <= qhat, 1L).otherwise(0L))
          .as("n_covered"))
      .select($"n_test", $"n_covered",
        expr("1000 * n_covered div n_test").as("coverage_permille"))
      .head()
    Seq((nCal, qhat, cov.getLong(0), cov.getLong(1), cov.getLong(2)))
      .toDF("n_cal", "qhat_cents", "n_test", "n_covered",
        "coverage_permille")
  }

  val q485Sql: String =
    """WITH base AS (
      |  SELECT o_orderpriority AS grp,
      |    CAST(FLOOR(100 * o_totalprice) AS BIGINT) AS y,
      |    CAST('0x' || substring(md5('cp:' || CAST(o_orderkey AS VARCHAR)),
      |                           1, 4) AS BIGINT) % 2 AS coin
      |  FROM orders),
      |cal AS (SELECT grp, y FROM base WHERE coin = 0),
      |test AS (SELECT grp, y FROM base WHERE coin = 1),
      |model AS (SELECT grp, CAST(SUM(y) AS BIGINT) // COUNT(*) AS yhat
      |          FROM cal GROUP BY 1),
      |cs AS (SELECT ABS(y - yhat) AS score FROM cal JOIN model USING (grp)),
      |n AS (SELECT COUNT(*) AS n_cal,
      |             (9 * (COUNT(*) + 1) + 9) // 10 AS k FROM cs),
      |qh AS (
      |  SELECT MIN(score) AS qhat FROM (
      |    SELECT score, SUM(cnt) OVER (ORDER BY score) AS cum
      |    FROM (SELECT score, COUNT(*) AS cnt FROM cs GROUP BY 1))
      |  WHERE cum >= (SELECT k FROM n)),
      |cov AS (
      |  SELECT COUNT(*) AS n_test,
      |    CAST(SUM(CASE WHEN ABS(y - yhat) <= (SELECT qhat FROM qh)
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      |  FROM test JOIN model USING (grp))
      |SELECT (SELECT n_cal FROM n) AS n_cal,
      |  (SELECT qhat FROM qh) AS qhat_cents,
      |  n_test, n_covered,
      |  1000 * n_covered // n_test AS coverage_permille
      |FROM cov""".stripMargin

  val queries: Map[String, Q] = Map(
    "q485_conformal" -> q485Conformal)
  val oracleSql: Map[String, String] = Map(
    "q485_conformal" -> q485Sql)
}
