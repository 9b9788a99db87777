package graft.operators

import graft.SparkSpec
import graft.relational.{BucketedQueries, RelationalQueries}
import org.apache.spark.sql.functions._

/** Pins the SCALE properties of the shuffle-management recipes: the
  * bucketed join plans with zero hash-partition exchanges, and the
  * salted join returns exactly the plain join's result.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed SMJ plans without any hashpartitioning exchange") {
    val df = BucketedQueries.q79BucketedJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the join itself must be co-located: neither JOIN KEY is ever
    // hash-exchanged (the only remaining shuffles are the tiny post-agg
    // exchange on the group key and the final orderBy range partition)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey")
        && !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles a join key:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), "not a bucketed scan")
  }

  test("bucketed join result equals the plain-join q05-style aggregate") {
    val bucketed = BucketedQueries.q79BucketedJoin(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    val plain = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        graft.core.dsl.dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"o_orderstatus")
      .as[(String, Long, Double)].collect().toSeq
    assert(bucketed == plain)
  }

  test("salted join equals the unsalted join row-for-row") {
    val salted = BucketedQueries.q80SaltedJoin(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    val plain = RelationalQueries.q05JoinShuffle(spark, dir)
      .select($"o_orderpriority", $"n_lines", $"sum_qty")
      .as[(String, Long, Double)].collect().toSeq
    assert(salted == plain)
  }

  test("salt assignment is deterministic and spreads a hot key") {
    val fact = Seq.tabulate(1000)(i => (1L, i.toLong)) // ONE hot key
      .toDF("k", "row_id")
    val dim = Seq((1L, "hot")).toDF("k2", "tag")
    val joined = SaltedJoin.inner(fact, dim, "k", "k2",
      saltCols = Seq($"k", $"row_id"), factor = 8)
    assert(joined.count() == 1000) // every fact row matched exactly once
    val salts = fact.withColumn("s",
        pmod(xxhash64($"k", $"row_id"), lit(8L)))
      .groupBy($"s").count().as[(Long, Long)].collect().toMap
    assert(salts.size == 8, s"hot key not spread over all salts: $salts")
    assert(salts.values.max <= 300, s"salt distribution too skewed: $salts")
  }
}
