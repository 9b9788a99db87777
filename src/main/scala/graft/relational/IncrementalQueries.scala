package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Incremental-maintenance operators: keyed upsert (MERGE) — the step
  * that turns a batch engine into an ETL engine, and the batch analogue
  * of the reference's snapshot refresh (cache.go:54-66 recomputes a
  * snapshot when upstream moves; an upsert refreshes only the moved
  * keys).
  */
object IncrementalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Keyed upsert: rows of `updates` replace same-key rows of `target`;
    * unmatched update keys append. Exactly SQL MERGE's
    * WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT for whole-row
    * payloads.
    *
    * Scale shape: ONE left-anti join on the key (broadcast when the
    * update batch is small — the common CDC case — or shuffle on the
    * key otherwise, AQE's call) plus a union; no window, no global
    * sort. The update batch must be key-unique (CDC compaction upstream
    * guarantees it; a `require`-style check would force a count, so the
    * contract is documented instead).
    */
  def upsert(target: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame =
    target.join(updates, keys, "left_anti").unionByName(updates)

  /** q102 — upsert applied to `customer` with a simulated CDC batch
    * (every BUILDING-segment customer re-arrives with +100 balance and
    * a refreshed comment). The oracle replays MERGE as anti-join +
    * union — the same algebra — and the result emits every merged row,
    * so the gate checks replaced, untouched, and (empty here)
    * inserted-key behavior row-by-row.
    */
  val q102Upsert: Q = (s, dir) => {
    import s.implicits._
    val target = T.customer(s, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
    val updates = T.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_mktsegment",
        ($"c_acctbal" + 100.0).as("c_acctbal"))
    upsert(target, updates, Seq("c_custkey"))
      .orderBy($"c_custkey")
  }

  val q102Sql: String =
    """WITH updates AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal
      |  FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      |WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
      |UNION ALL
      |SELECT c_custkey, c_mktsegment, c_acctbal FROM updates
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q102_upsert" -> q102Upsert,
  )

  val oracleSql: Map[String, String] = Map(
    "q102_upsert" -> q102Sql,
  )
}
