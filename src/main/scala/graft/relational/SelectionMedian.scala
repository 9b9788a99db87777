package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Two-pass DISTRIBUTED SELECTION for the exact grouped median — the
  * algorithm that replaces q90's rank-window spelling when groups are
  * too big to sort: a window median sorts EVERY group's rows
  * (n·log n shuffle-and-sort per group); selection finds the k-th
  * element with (1) one partial-aggregated HISTOGRAM pass over
  * fixed-width value buckets, (2) a cumulative scan of the bucket
  * frame — bounded by value-range/width, not rows — to locate the
  * bucket holding rank k and the residual rank within it, and (3) one
  * window over ONLY that bucket's rows (expected n/buckets of the
  * group). The classic external-selection recipe (Blum et al.'s
  * selection problem in its bucketed engineering form), exact because
  * values are integers and buckets tile the domain.
  *
  * Median convention: k = (n+1) div 2 — the lower median, identical
  * to `percentile_disc(0.5)` in both engines, all-integer.
  *
  * Scale shape: pass 1 is one groupBy (group, bucket) partial agg;
  * the bucket frame gets one keyed cumulative window (bounded rows);
  * pass 3 joins the (group, target-bucket, residual) frame — one row
  * per group, broadcast — back to the data as a bucket-pruned filter,
  * so the final sort touches ~1/buckets of each group. No global
  * sort, no full-group window anywhere.
  */
object SelectionMedian {

  type Q = (SparkSession, String) => DataFrame

  /** Bucket width in cents: extendedprice spans ~[90k, 11M] cents, so
    * ~10k buckets — the bucket frame stays thousands of rows per
    * group while pass 3 touches ~0.01% of each group.
    */
  val BucketCents = 1024L

  /** q307 — exact per-returnflag median of extendedprice (cents) by
    * two-pass selection.
    */
  val q307SelectionMedian: Q = (s, dir) => {
    import s.implicits._
    val base = T.lineitem(s, dir)
      .select($"l_returnflag".as("g"),
        expr("CAST(FLOOR(100 * l_extendedprice) AS BIGINT)").as("x"))
      .localCheckpoint() // two passes over the same frame
    val hist = base
      .withColumn("b", expr(s"x div $BucketCents"))
      .groupBy($"g", $"b").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy($"g").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy($"g")
    val located = hist
      .withColumn("cum", sum($"c").over(wCum))
      .withColumn("n", sum($"c").over(wAll))
      .withColumn("k", expr("(n + 1) div 2"))
      .filter($"cum" >= $"k" && $"cum" - $"c" < $"k")
      .select($"g".as("lg"), $"b".as("tb"), $"n",
        ($"k" - ($"cum" - $"c")).as("off"))
    val wIn = Window.partitionBy($"g").orderBy($"x")
    base
      .withColumn("b", expr(s"x div $BucketCents"))
      .join(broadcast(located), $"b" === $"tb" && $"g" === $"lg")
      .withColumn("rn", row_number().over(wIn))
      .filter($"rn" === $"off")
      .select($"g".as("l_returnflag"), $"n", $"x".as("median_cents"))
      .orderBy($"l_returnflag")
  }

  /** The oracle is the SPEC: percentile_disc(0.5) — what any number
    * of selection passes must equal.
    */
  val q307Sql: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(percentile_disc(0.5) WITHIN GROUP (
      |    ORDER BY CAST(FLOOR(100 * l_extendedprice) AS BIGINT)) AS BIGINT)
      |    AS median_cents
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, Q] = Map(
    "q307_selection_median" -> q307SelectionMedian)
  val oracleSql: Map[String, String] = Map(
    "q307_selection_median" -> q307Sql)
}
