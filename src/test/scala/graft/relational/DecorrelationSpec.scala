package graft.relational

import graft.SparkSpec

/** Pins that q181/q182's correlated subqueries are DECORRELATED by
  * Catalyst — rewritten into aggregates + (semi-)joins — and never
  * survive optimization as per-row subquery expressions. This is the
  * plan contract the queries' scaladocs promise; at scale a surviving
  * correlated subquery is a nested-loop re-execution per outer row.
  */
class DecorrelationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Q2 shape: correlated scalar MIN rewrites to aggregate + join") {
    val df = AnalyticalQueries.q181MinCostSupplier(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"),
      s"correlated scalar subquery survived optimization:\n$optimized")
    assert(optimized.contains("Aggregate"), s"no aggregate:\n$optimized")
    // and it actually answers: every part's min_cost is its group min
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
      .view.mapValues(_.map(_.getAs[Double]("min_cost")).distinct)
    assert(byPart.values.forall(_.size == 1),
      "a part surfaced more than one 'minimum' cost")
  }

  test("LATERAL top-2 equals the window spelling row-for-row") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lateral = AnalyticalQueries.q189LateralTopk(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val windowed = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        $"o_custkey" === $"c_custkey", "left_semi")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"o_custkey".as("c_custkey"), $"o_orderkey", $"o_totalprice")
      .orderBy($"c_custkey", $"o_totalprice".desc, $"o_orderkey")
      .as[(Long, Long, Double)].collect().toSeq
    assert(lateral.nonEmpty)
    assert(lateral == windowed, "lateral and window spellings diverged")
  }

  test("Q20 shape: nested IN + correlated HAVING rewrites to semi joins") {
    val df = AnalyticalQueries.q182ExcessVolume(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery") &&
      !optimized.contains("in-subquery"),
      s"subquery expression survived optimization:\n$optimized")
    assert(optimized.contains("LeftSemi"),
      s"IN did not become a semi join:\n$optimized")
    df.collect() // must execute cleanly
  }
}
