package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Probe-side contract for `cms_estimate` (q223). */
class CmsEstimateSpec extends AnyFunSuite with SparkSpec {

  test("estimates never undercount and hit exactly without collisions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // 10 keys, key k occurring k+1 times; sketch wide enough that
    // collisions are essentially impossible at this cardinality
    val rows = (0 until 10).flatMap(k => Seq.fill(k + 1)(k.toLong))
    val df = rows.toDF("key").repartition(4)
    val sk = df.agg(
      expr("count_min_sketch(key, 0.001d, 0.99d, 7)").as("cms"))
    val probed = df.groupBy($"key").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .withColumn("est", expr("cms_estimate(cms, key)"))
      .select($"key", $"exact", $"est")
      .as[(Long, Long, Long)].collect()
    assert(probed.length === 10)
    probed.foreach { case (k, exact, est) =>
      assert(est === exact, s"key $k: est $est != exact $exact")
    }
  }

  test("absent keys estimate to zero on a collision-free sketch") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("key")
    val sk = df.agg(expr("count_min_sketch(key, 0.001d, 0.99d, 7)").as("cms"))
    val est = sk.selectExpr("cms_estimate(cms, 99L) AS e")
      .as[Long].head()
    assert(est === 0L)
  }
}
