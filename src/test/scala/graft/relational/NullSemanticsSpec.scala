package graft.relational

import graft.SparkSpec

/** q214 contract: null-safe equality must stay hash-joinable — Spark
  * hashes NULL to an ordinary bucket — and the NULL bucket must
  * actually pair up (the row a plain equi-join silently drops).
  */
class NullSemanticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("null-safe equality plans as an equi-join, not a nested loop") {
    val df = NullSemantics.q214NullSafeJoin(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"),
      s"null-safe equality degraded to a nested loop:\n$physical")
    assert(physical.contains("Join"), s"no join in plan:\n$physical")
  }

  test("the NULL bucket joins; a plain equi-join drops it") {
    import spark.implicits._
    val rows = NullSemantics.q214NullSafeJoin(spark, dir).collect()
    assert(rows.exists(_.isNullAt(0)), "no NULL-bucket row in the null-safe join")
    assert(rows.length == 10)
  }
}
