package graft.relational

import graft.SparkSpec

/** Plan contracts for the q204–q211 TPC-H completion shapes — the
  * properties that keep them linear-scan at 100 TB: the Q4 EXISTS must
  * become a semi join (not a per-row subquery), the Q6 predicates must
  * all reach the parquet scan, the Q8 dimension chain must broadcast,
  * and the Q11 threshold must stay an uncorrelated 1-row subquery.
  */
class TpchCompletionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Q4 shape: correlated EXISTS with non-equi conjunct becomes a semi join") {
    val df = TpchCompletionQueries.q204PriorityCheck(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("exists-subquery"),
      s"EXISTS survived optimization:\n$optimized")
    assert(optimized.contains("LeftSemi"),
      s"EXISTS did not become a semi join:\n$optimized")
    assert(df.collect().nonEmpty)
  }

  test("Q6 shape: all three predicates reach the lineitem scan") {
    val df = TpchCompletionQueries.q205ForecastRevenue(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    // the plan printer truncates long filter lists ("...") before the
    // closing bracket, so take the line tail rather than a [...] match
    val pushed = physical.split("PushedFilters: ").lift(1)
      .map(_.takeWhile(_ != '\n')).getOrElse("")
    for (frag <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(frag), s"$frag not pushed: $pushed")
    assert(df.collect().length == 1)
  }

  test("Q8 shape: the dimension chain broadcasts (no shuffle for nation/region)") {
    val df = TpchCompletionQueries.q207MarketShare(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(physical).length
    assert(broadcasts >= 3,
      s"expected >=3 broadcast joins in the 8-way tree, found $broadcasts:\n$physical")
    assert(df.collect().nonEmpty)
  }

  test("Q11 shape: the HAVING threshold is an uncorrelated scalar subquery, not a join") {
    val df = TpchCompletionQueries.q209ImportantParts(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("scalar-subquery"),
      s"expected the uncorrelated threshold to stay a 1-row scalar subquery:\n$optimized")
    assert(df.collect().nonEmpty)
  }

  test("Q7 shape: the bilateral pair is non-empty in both directions at smoke scale") {
    val rows = TpchCompletionQueries.q206VolumeShipping(spark, dir).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("NATION_3", "NATION_8")) &&
      pairs.contains(("NATION_8", "NATION_3")),
      s"expected both trade directions at sf0.001, got $pairs")
  }

  test("Q12/Q14 results agree between the DataFrame spelling and the SQL oracle text") {
    graft.core.Tables.orders(spark, dir).createOrReplaceTempView("orders")
    graft.core.Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    graft.core.Tables.part(spark, dir).createOrReplaceTempView("part")
    val df12 = TpchCompletionQueries.q210PriorityCounts(spark, dir).collect().toSeq
    val sql12 = spark.sql(TpchCompletionQueries.q210Sql).collect().toSeq
    assert(df12.map(_.toSeq) == sql12.map(_.toSeq))
    val df14 = TpchCompletionQueries.q211PromoShare(spark, dir).collect().toSeq
    val sql14 = spark.sql(TpchCompletionQueries.q211Sql).collect().toSeq
    assert(df14.map(_.toSeq) == sql14.map(_.toSeq))
  }
}
