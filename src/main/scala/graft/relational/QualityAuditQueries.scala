package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Data-quality audit — the pre-flight checks an ETL run executes
  * before publishing a snapshot (the reference publishes atomically,
  * main.go:91-119; auditing BEFORE the swap is what makes the atomic
  * swap safe to automate): key uniqueness, null rates, referential
  * orphans, domain-range violations, each as one row of a metrics
  * frame.
  *
  * Scale shape: every check is an aggregate or an anti-join the engine
  * already optimizes — uniqueness is count vs count(distinct) on the
  * key, orphan detection is a left-anti join on the FK (AQE
  * broadcast/shuffle as sizes dictate), range checks are codegen
  * filters. The checks union into one tiny metrics frame, so one audit
  * pass costs a handful of scans that all push down and prune.
  */
object QualityAuditQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q107 — audit of orders/lineitem/customer: primary-key uniqueness,
    * FK orphan counts in both directions, null counts on required
    * columns, and a domain-range violation count. `violations == 0`
    * rows double as the assertion the pipeline would gate on.
    */
  val q107DqAudit: Q = (s, dir) => {
    import s.implicits._
    val orders = T.orders(s, dir)
    val lineitem = T.lineitem(s, dir)
    val customer = T.customer(s, dir)
    def metric(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check"), $"violations".cast("long"))
    val checks = Seq(
      // PK uniqueness: duplicates of o_orderkey
      metric("orders_pk_unique", orders.agg(
        (count(lit(1)) - countDistinct($"o_orderkey")).as("violations"))),
      metric("customer_pk_unique", customer.agg(
        (count(lit(1)) - countDistinct($"c_custkey")).as("violations"))),
      // referential integrity: lineitem rows whose order is missing,
      // and orders whose customer is missing
      metric("lineitem_order_fk", lineitem
        .join(orders, $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("violations"))),
      metric("orders_customer_fk", orders
        .join(customer, $"o_custkey" === $"c_custkey", "left_anti")
        .agg(count(lit(1)).as("violations"))),
      // completeness: required columns must be non-null
      metric("orders_date_not_null", orders.agg(
        sum(when($"o_orderdate".isNull, 1L).otherwise(0L)).as("violations"))),
      // domain ranges: quantities positive, discounts within [0, 1]
      metric("lineitem_qty_positive", lineitem.agg(
        sum(when($"l_quantity" <= 0.0, 1L).otherwise(0L)).as("violations"))),
      metric("lineitem_discount_range", lineitem.agg(
        sum(when($"l_discount" < 0.0 || $"l_discount" > 1.0, 1L)
          .otherwise(0L)).as("violations"))))
    checks.reduce(_ unionByName _)
      .withColumn("passed", $"violations" === 0L)
      .orderBy($"check")
  }

  val q107Sql: String =
    """SELECT "check", CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS passed FROM (
      |  SELECT 'orders_pk_unique' AS "check",
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS violations FROM orders
      |  UNION ALL
      |  SELECT 'customer_pk_unique',
      |    COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
      |  UNION ALL
      |  SELECT 'lineitem_order_fk', COUNT(*) FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |  UNION ALL
      |  SELECT 'orders_customer_fk', COUNT(*) FROM orders
      |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL
      |  SELECT 'orders_date_not_null',
      |    SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_qty_positive',
      |    SUM(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_discount_range',
      |    SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
      |        THEN 1 ELSE 0 END) FROM lineitem)
      |ORDER BY "check"""".stripMargin

  val queries: Map[String, Q] = Map(
    "q107_dq_audit" -> q107DqAudit,
  )

  val oracleSql: Map[String, String] = Map(
    "q107_dq_audit" -> q107Sql,
  )
}
