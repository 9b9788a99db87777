package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Time-series regularization: resample an irregular per-key event
  * series onto a fixed time grid with forward fill — the step that
  * turns event logs into model-ready feature series (gap-free, one row
  * per key per interval), which Spark has no single operator for.
  *
  * Composition (all standard operators, so Catalyst optimizes each
  * edge): per-(key, bucket) "last observation" via one windowed
  * row_number; per-key grid via `sequence()` + `explode` (narrow — the
  * grid is GENERATED next to the data, never shuffled in); a left join
  * of grid onto observations (both sides hash-partition on the key);
  * and forward fill as `last(value, ignoreNulls)` over the per-key
  * time order. State never leaves the executors and every window is
  * keyed, so the shape survives any number of keys.
  */
object TimeSeriesQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Resample `df`'s (keyCol, tsCol, valueCol) onto a per-key grid of
    * `step` (a calendar-interval SQL string), bucketing by
    * `date_trunc(unit)`, keeping the LAST observation per bucket
    * (latest tsCol, ties to the highest `tieCol`) and forward-filling
    * empty buckets from the previous observed one.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, unit: String = "hour",
      step: String = "interval 1 hour"): DataFrame = {
    val wLast = Window.partitionBy(col(keyCol), col("h"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val obs = df
      .withColumn("h", date_trunc(unit, col(tsCol)))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("h"), col(valueCol).as("v"))
    val grid = df.groupBy(col(keyCol))
      .agg(date_trunc(unit, min(col(tsCol))).as("h0"),
        date_trunc(unit, max(col(tsCol))).as("h1"))
      .select(col(keyCol), explode(expr(s"sequence(h0, h1, $step)")).as("h"))
    val wFill = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(obs, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"),
        last(col("v"), ignoreNulls = true).over(wFill).as("v_ffill"),
        col("v").isNotNull.as("has_obs"))
  }

  /** q104 — hourly resample + forward fill of each user's event-value
    * series. ~90% of grid points are gaps at test scale, so the fill
    * path carries the row; the oracle replays bucket-last, grid, and
    * `IGNORE NULLS` fill in SQL.
    */
  val q104ResampleFfill: Q = (s, dir) => {
    import s.implicits._
    resampleFfill(
      T.events(s, dir).select($"user_id", $"ts", $"value", $"event_id"),
      keyCol = "user_id", tsCol = "ts", valueCol = "value",
      tieCol = "event_id")
      .orderBy($"user_id", $"h")
  }

  val q104Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |obs0 AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM ev),
      |obs AS (SELECT user_id, h, value AS v FROM obs0 WHERE rn = 1),
      |span AS (
      |  SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
      |    date_trunc('hour', MAX(ts)) AS h1
      |  FROM ev GROUP BY user_id),
      |grid AS (
      |  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM span),
      |j AS (
      |  SELECT g.user_id, g.h, obs.v
      |  FROM grid g LEFT JOIN obs ON g.user_id = obs.user_id AND g.h = obs.h)
      |SELECT user_id, h,
      |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
      |  v IS NOT NULL AS has_obs
      |FROM j
      |ORDER BY user_id, h""".stripMargin

  val queries: Map[String, Q] = Map(
    "q104_resample_ffill" -> q104ResampleFfill,
  )

  val oracleSql: Map[String, String] = Map(
    "q104_resample_ffill" -> q104Sql,
  )
}
