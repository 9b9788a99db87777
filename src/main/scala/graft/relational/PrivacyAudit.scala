package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** k-anonymity audit over a quasi-identifier projection — the
  * data-release gate that runs BEFORE a curated table leaves the
  * pipeline (Sweeney 2002). A row is k-anonymous when at least k rows
  * share its quasi-identifier tuple; classes below k re-identify and
  * must be suppressed or generalized before publication. q93/q213
  * scrub direct identifiers (PII values inside text); this audits the
  * complementary INDIRECT channel — combinations of innocuous columns.
  */
object PrivacyAudit {

  type Q = (SparkSession, String) => DataFrame

  /** Publication threshold. 8 leaves both publishable and suppressed
    * classes non-empty at sf0.01 (class sizes span 5–21 there), so
    * neither branch of the decision is vacuous.
    */
  val AnonymityK = 8

  /** q217 — per-equivalence-class k-anonymity decision over the
    * (c_nationkey, c_mktsegment) quasi-identifier pair: class size and
    * the publish/suppress verdict for every class. The minimum
    * `class_n` over the output IS the table's k-anonymity; the
    * suppressed row count is the utility cost of releasing at
    * [[AnonymityK]].
    *
    * Scale shape: a single hash aggregation on the QI columns —
    * map-side partials collapse each partition to ≤ |QI-domain| rows
    * before the shuffle, so the audit costs one scan regardless of
    * table size; the class table itself is domain-bounded and tiny.
    */
  val q217KAnonymity: Q = (s, dir) => {
    import s.implicits._
    T.customer(s, dir)
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("class_n"))
      .select($"c_nationkey", $"c_mktsegment", $"class_n",
        ($"class_n" >= AnonymityK).as("publishable"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  val q217Sql: String =
    s"""SELECT c_nationkey, c_mktsegment,
       |  CAST(COUNT(*) AS BIGINT) AS class_n,
       |  COUNT(*) >= $AnonymityK AS publishable
       |FROM customer
       |GROUP BY c_nationkey, c_mktsegment
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  val queries: Map[String, Q] = Map(
    "q217_k_anonymity" -> q217KAnonymity,
  )

  val oracleSql: Map[String, String] = Map(
    "q217_k_anonymity" -> q217Sql,
  )
}
