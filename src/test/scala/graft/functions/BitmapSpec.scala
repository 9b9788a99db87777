package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Roaring bitmap algebra: exact cardinalities, planted-set
  * intersections/unions, lossless cube re-aggregation, merge-order
  * independence, null handling, and the 32-bit key-range guard.
  */
class BitmapSpec extends SparkSpec {
  import spark.implicits._

  test("rbm_count(rbm_agg) is exact and partitioning-independent") {
    GraftFunctions.register(spark)
    val keys = Seq.tabulate(5000)(i => (i * 37) % 1777).map(_.toLong)
    val expected = keys.distinct.size.toLong
    for (parts <- Seq(1, 13)) {
      val n = keys.toDF("id").repartition(parts)
        .agg(expr("rbm_count(rbm_agg(id))")).first().getLong(0)
      assert(n == expected, s"parts=$parts: $n != $expected")
    }
  }

  test("planted sets: and/or counts are exact") {
    GraftFunctions.register(spark)
    // A = [0, 600), B = [400, 1000): |A∩B| = 200, |A∪B| = 1000
    val a = (0L until 600L).toDF("id")
      .agg(expr("rbm_agg(id)").as("a"))
    val b = (400L until 1000L).toDF("id")
      .agg(expr("rbm_agg(id)").as("b"))
    val row = a.crossJoin(b).select(
      expr("rbm_and_count(a, b)"), expr("rbm_or_count(a, b)"),
      expr("rbm_count(a)")).first()
    assert(row.getLong(0) == 200L, s"and ${row.getLong(0)} != 200")
    assert(row.getLong(1) == 1000L, s"or ${row.getLong(1)} != 1000")
    assert(row.getLong(2) == 600L, s"count ${row.getLong(2)} != 600")
  }

  test("rbm_or_agg re-aggregates a cube losslessly") {
    GraftFunctions.register(spark)
    // keys spread over 10 'days' with heavy cross-day repetition
    val rows = Seq.tabulate(4000)(i => (i % 10, ((i * 131) % 997).toLong))
    val df = rows.toDF("day", "id")
    val direct = df.agg(expr("rbm_count(rbm_agg(id))")).first().getLong(0)
    val rolled = df.groupBy($"day")
      .agg(expr("rbm_agg(id)").as("bm"))
      .agg(expr("rbm_count(rbm_or_agg(bm))")).first().getLong(0)
    assert(direct == rolled, s"rollup $rolled != direct $direct")
    assert(direct == rows.map(_._2).distinct.size.toLong)
  }

  test("nulls are ignored by both aggregates") {
    GraftFunctions.register(spark)
    val df = Seq[Option[Long]](Some(1L), None, Some(2L), None, Some(1L))
      .toDF("id")
    val n = df.agg(expr("rbm_count(rbm_agg(id))")).first().getLong(0)
    assert(n == 2L, s"$n != 2")
    val withNullBm = df.agg(expr("rbm_agg(id)").as("bm"))
      .select($"bm").union(Seq(null.asInstanceOf[Array[Byte]]).toDF("bm"))
    val rolled = withNullBm.agg(expr("rbm_count(rbm_or_agg(bm))"))
      .first().getLong(0)
    assert(rolled == 2L, s"null-tolerant or_agg $rolled != 2")
  }

  test("keys outside [0, 2^31-1] fail loudly, not by truncation") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      Seq(-1L).toDF("id").agg(expr("rbm_agg(id)")).collect()
    }
    assert(err.getMessage != null)
  }

  test("DistinctToBitmap: rewrite fires for int, preserves results " +
      "incl. negatives/nulls/empty groups, skips wider types") {
    import org.apache.spark.sql.functions.{count, countDistinct, lit}
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(3000) { i =>
      (i % 7, if (i % 11 == 0) None else Some(rnd.nextInt() / 1000))
    }
    val df = rows.toDF("g", "v")
      .select($"g", $"v".cast("int").as("v"))
    def run() = df.groupBy($"g")
      .agg(countDistinct($"v").as("d"), count(lit(1)).as("n"))
      .orderBy($"g").collect().toSeq
    val expected = run()
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.DistinctToBitmap
    try {
      val rewritten = df.groupBy($"g")
        .agg(countDistinct($"v").as("d"), count(lit(1)).as("n"))
        .orderBy($"g")
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("rbm_agg"), s"rewrite did not fire:\n$plan")
      assert(rewritten.collect().toSeq == expected)
      // LongType distinct is left alone
      val longPlan = df.select($"g", $"v".cast("long").as("v"))
        .groupBy($"g").agg(countDistinct($"v"))
        .queryExecution.executedPlan.toString
      assert(!longPlan.contains("rbm_agg"),
        s"rewrite must not touch non-int types:\n$longPlan")
      // global aggregate over zero rows still yields the 0 row
      val empty = df.filter($"g" === 999)
        .agg(countDistinct($"v")).collect()
      assert(empty.length == 1 && empty.head.getLong(0) == 0L)
    } finally spark.experimental.extraOptimizations = prev
  }
}
