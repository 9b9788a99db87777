package graft.functions

import scala.util.Random

import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

/** Contracts for the mg_topk TypedImperativeAggregate: exact recovery
  * below capacity, the N/(k+1) error bound and heavy-key completeness
  * across merge trees (partitionings), and partial aggregation in the
  * physical plan.
  */
class MisraGriesSpec extends SparkSpec with TableDrivenPropertyChecks {

  import spark.implicits._

  private def register(): Unit = GraftFunctions.register(spark)

  test("distinct keys <= k: summary is the exact count map") {
    register()
    val data = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("v")
    data.createOrReplaceTempView("mg_exact")
    val out = spark.sql("SELECT mg_topk(v, 8) AS s FROM mg_exact")
      .selectExpr("explode(s) AS e").selectExpr("e.key", "e.est")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 3L))
  }

  test("bounds + heavy-key completeness hold across partitionings") {
    register()
    val rnd = new Random(7)
    // skewed stream: key i chosen ∝ zipf-ish over 200 keys
    val data = Seq.fill(20000)((rnd.nextInt(rnd.nextInt(200) + 1)).toLong)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val k = 16
    for (parts <- Seq(1, 3, 32)) {
      val df = spark.createDataset(data).repartition(parts).toDF("v")
      df.createOrReplaceTempView("mg_prop")
      val est = spark.sql(s"SELECT mg_topk(v, $k) AS s FROM mg_prop")
        .selectExpr("explode(s) AS e").selectExpr("e.key", "e.est")
        .as[(Long, Long)].collect().toMap
      assert(est.size <= k)
      est.foreach { case (key, e) =>
        val t = exact.getOrElse(key, 0L)
        assert(e <= t, s"parts=$parts key=$key overcounts: est=$e exact=$t")
        assert(t - e <= n / (k + 1) + 1,
          s"parts=$parts key=$key bound broken: est=$e exact=$t")
      }
      exact.filter(_._2 > n / (k + 1)).keys.foreach { hk =>
        assert(est.contains(hk), s"parts=$parts heavy key $hk missing")
      }
    }
  }

  test("plans as ObjectHashAggregate with partial aggregation") {
    register()
    val df = spark.range(1000).selectExpr("id % 7 AS g", "id % 13 AS v")
      .groupBy("g").agg(org.apache.spark.sql.functions.expr("mg_topk(v, 4)"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate:\n$physical")
    assert(physical.contains("partial_mg_topk") || physical.contains("partial mg_topk")
      || "ObjectHashAggregate".r.findAllIn(physical).length >= 2,
      s"no partial aggregation visible:\n$physical")
  }
}
