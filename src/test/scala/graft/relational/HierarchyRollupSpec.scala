package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the BOM rollup at sf0.001: leaves roll up
  * to exactly their own price, every parent's extended cost is its
  * price plus the qty-weighted sum of its children's extended costs
  * (checked by one relational replay of the recurrence over the
  * output), and the output covers every part exactly once.
  */
class HierarchyRollupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val parts = graft.core.Tables.part(spark, dir)
    .select(($"p_partkey" + 1).as("k"),
      expr("(p_partkey + 1) div 10").as("parent"),
      (($"p_partkey" + 1) % 3 + 1).as("qty"),
      expr("CAST(FLOOR(100 * p_retailprice) AS BIGINT)").as("price"))

  private lazy val out = HierarchyRollup
    .q325BomRollup(spark, dir)
    .select(($"p_partkey" + 1).as("k"), $"ext_cost_cents".as("ext"))
    .localCheckpoint()

  test("one output row per part") {
    assert(out.count() == parts.count())
    assert(out.select($"k").distinct().count() == parts.count())
  }

  test("leaves carry exactly their own price") {
    val leaves = parts.as("p")
      .join(parts.as("c"), $"c.parent" === $"p.k", "left_anti")
    val bad = leaves.join(out, "k").filter($"ext" =!= $"price").count()
    assert(bad == 0L, s"$bad leaves disagree with price")
  }

  test("recurrence holds at every node: ext = price + sum(qty*child_ext)") {
    val childSum = parts.as("c").join(out.as("o"), $"c.k" === $"o.k")
      .groupBy($"c.parent".as("k"))
      .agg(sum($"c.qty" * $"o.ext").as("cs"))
    val bad = parts.join(out, "k")
      .join(childSum, Seq("k"), "left")
      .na.fill(0L, Seq("cs"))
      .filter($"ext" =!= $"price" + $"cs")
      .count()
    assert(bad == 0L, s"$bad nodes violate the rollup recurrence")
  }

  test("q349 native WITH RECURSIVE: UnionLoop in plan, result == q325 DP") {
    val rec = HierarchyRollup.q349RecursiveCte(spark, dir)
    val opt = rec.queryExecution.optimizedPlan.toString
    assert(opt.contains("UnionLoop"),
      s"native recursion operator missing from plan:\n$opt")
    val recOut = rec.select(($"p_partkey" + 1).as("k"),
      $"ext_cost_cents".as("rext"))
    val diff = out.join(recOut, Seq("k"), "full_outer")
      .filter($"ext".isNull || $"rext".isNull || $"ext" =!= $"rext")
      .count()
    assert(diff == 0L, s"$diff nodes diverge between DP and native recursion")
  }
}
