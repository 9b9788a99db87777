package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the keyed upsert: replaced, untouched, and inserted
  * keys in one merge (q102's oracle exercises replace/keep on real
  * data; the insert path is covered here).
  */
class IncrementalQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces matched keys, keeps unmatched, appends new") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")
    val updates = Seq((2L, "b2", 99.0), (9L, "new", 1.0))
      .toDF("k", "tag", "v")
    val got = IncrementalQueries.upsert(target, updates, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, "a", 10.0),   // untouched
      (2L, "b2", 99.0),  // replaced
      (3L, "c", 30.0),   // untouched
      (9L, "new", 1.0))) // inserted
  }

  test("snapshotDiff classifies insert/update/delete and skips unchanged," +
      " null-safely") {
    val before = Seq(
      (1L, Option("a"), Option(10.0)),  // unchanged
      (2L, None: Option[String], None: Option[Double]), // unchanged, nulls
      (3L, Option("c"), Option(30.0)),  // updated value -> null
      (4L, None: Option[String], Option(40.0)), // updated null -> value
      (5L, Option("e"), Option(50.0)))  // deleted
      .toDF("k", "tag", "v")
    val after = Seq(
      (1L, Option("a"), Option(10.0)),
      (2L, None: Option[String], None: Option[Double]),
      (3L, Option("c"), None: Option[Double]),
      (4L, Option("d"), Option(40.0)),
      (6L, Option("f"), Option(60.0))) // inserted
      .toDF("k", "tag", "v")
    val got = IncrementalQueries.snapshotDiff(before, after, Seq("k"))
      .select($"k", $"op").as[(Long, String)].collect().toMap
    assert(got == Map(3L -> "update", 4L -> "update",
      5L -> "delete", 6L -> "insert"),
      s"wrong classification: $got")
  }

  test("q105 merged partials equal the single-pass aggregation") {
    val dir = "/root/testdata/sf0.001"
    val got = IncrementalQueries.q105IncrementalAgg(spark, dir)
      .as[(String, Long, Double, Double)].collect().toSeq
    val full = graft.core.Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        graft.core.dsl.dsumExpr($"value").as("sum_value"))
      .withColumn("avg_value", $"sum_value" / $"n_events")
      .orderBy($"event_type")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got.nonEmpty && got == full,
      s"merge != full recompute: $got vs $full")
  }
}
