package graft.relational

import graft.SparkSpec

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
}
