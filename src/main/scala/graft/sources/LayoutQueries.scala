package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T, dsl, OracleDsl => O}

/** Date-partitioned table layout + partition pruning — the write-side
  * scale recipe: laying a fact table out by day means a day-filtered
  * query lists and reads ONLY that day's files (the generalization of
  * the reference's (package, schema) directory layout, main.go:226-238,
  * where the route handler opens exactly one partition directory).
  *
  * q111 proves all three legs in one oracle row: the layout builds
  * through the real partitioned writer, the day-filtered read is
  * REQUIRED to carry a partition filter in its physical plan (pruning,
  * not post-scan filtering), and the aggregate over the pruned scan
  * hash-matches DuckDB reading the same files with hive partitioning.
  */
object LayoutQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Fixed path so the static oracle SQL can address the layout. */
  val LayoutRoot = "/root/repo/target/fixtures/layout_events"
  val PruneDay = "2024-01-15"

  /** Build the day-partitioned layout once per (sfDir) — marker-keyed
    * like q91's GC fixture; switching scale factors rebuilds.
    */
  private def ensureLayout(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val marker = Paths.get(LayoutRoot, ".fixture_key")
    val key = s"events:$dir"
    val cached = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == key
    if (!cached) {
      T.events(s, dir)
        .withColumn("event_day", date_format($"ts", "yyyy-MM-dd"))
        .repartition($"event_day")
        .sortWithinPartitions($"event_day", $"user_id", $"ts")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("event_day")
        .parquet(LayoutRoot)
      Files.write(marker, key.getBytes("UTF-8"))
    }
  }

  /** q111 — aggregate one day off the partitioned layout; the physical
    * plan must prune at the partition level (a scan whose
    * `PartitionFilters` carries the day predicate), which is asserted
    * in the query itself so the green oracle row certifies layout,
    * pruning, and correctness together.
    */
  val q111PartitionPruning: Q = (s, dir) => {
    import s.implicits._
    ensureLayout(s, dir)
    val day = s.read.parquet(LayoutRoot)
      .filter($"event_day" === PruneDay)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsl.dsumExpr($"value").as("sum_value"))
      .orderBy($"event_type")
    val plan = day.queryExecution.executedPlan.toString
    require(plan.contains("PartitionFilters: [") &&
      plan.contains("event_day"),
      s"day filter did not prune partitions; plan:\n$plan")
    require(!plan.contains("PartitionFilters: []"),
      s"empty partition filter — scan reads every day; plan:\n$plan")
    day
  }

  val q111Sql: String =
    s"""SELECT event_type, COUNT(*) AS n,
       |  ${O.dsumExpr("value")} AS sum_value
       |FROM read_parquet('$LayoutRoot/*/*.parquet',
       |                  hive_partitioning=1, hive_types_autocast=0)
       |WHERE event_day = '$PruneDay'
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q111_partition_pruning" -> q111PartitionPruning,
  )

  val oracleSql: Map[String, String] = Map(
    "q111_partition_pruning" -> q111Sql,
  )
}
