package graft.relational

import graft.SparkSpec

/** Plan contracts for the q191–q196 TPC-H shapes: the correlated AVG
  * (Q17) must decorrelate, the NOT IN (Q16) must become an anti join,
  * the NOT EXISTS (Q22) likewise, and the Q19 disjunction must split
  * into per-side filters that reach BOTH parquet scans — these are the
  * properties that keep the shapes linear-scan at 100 TB instead of
  * per-row nested loops or unfiltered scans.
  */
class TpchShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Q17 shape: correlated AVG decorrelates to aggregate + join") {
    val df = TpchShapeQueries.q194SmallQtyRevenue(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"),
      s"correlated AVG survived optimization:\n$optimized")
    assert(optimized.contains("Aggregate"), s"no aggregate:\n$optimized")
    assert(df.collect().length == 1)
  }

  test("Q16 shape: NOT IN becomes an anti join, not a per-row subquery") {
    val df = TpchShapeQueries.q193SupplierCnt(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("in-subquery"),
      s"IN-subquery survived optimization:\n$optimized")
    assert(optimized.contains("LeftAnti"),
      s"NOT IN did not become an anti join:\n$optimized")
    assert(df.collect().nonEmpty)
  }

  test("Q22 shape: NOT EXISTS becomes an anti join; thresholds are 1-row subqueries") {
    val df = TpchShapeQueries.q196HighBalanceNoUrgent(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftAnti"),
      s"NOT EXISTS did not become an anti join:\n$optimized")
    assert(!optimized.contains("exists-subquery"),
      s"exists-subquery survived optimization:\n$optimized")
    assert(df.collect().nonEmpty)
  }

  test("Q19 shape: the disjunction reaches both scans as pushed filters") {
    val df = TpchShapeQueries.q195DisjunctiveRevenue(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    // Each parquet scan must carry an Or in PushedFilters — the factored
    // side-local disjunction (brand/size on part, quantity on lineitem).
    val pushedOrs = "PushedFilters: \\[[^\\]]*Or\\(".r
      .findAllIn(physical).length
    assert(pushedOrs >= 2,
      s"expected an Or in both scans' PushedFilters, found $pushedOrs:\n$physical")
    assert(df.collect().length == 1)
  }

  test("Q13 shape: zero-order customers survive the filtered left join") {
    import spark.implicits._
    val rows = TpchShapeQueries.q191OrderCountDist(spark, dir)
      .as[(Long, Long)].collect().toMap
    // every customer has >=1 order in the fixture, but URGENT-only
    // customers must land in the c_count=0 bucket rather than vanish —
    // the reason the filter must live in the JOIN condition, not WHERE.
    val total = rows.values.sum
    val nCust = graft.core.Tables.customer(spark, dir).count()
    assert(total == nCust,
      s"distribution covers $total customers, expected $nCust")
  }
}
