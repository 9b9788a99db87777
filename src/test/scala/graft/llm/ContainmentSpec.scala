package graft.llm

import graft.SparkSpec

/** Planted doc-inside-doc: a small document embedded verbatim in a
  * much larger one has containment 1.0 but tiny Jaccard — the exact
  * pair the containment join must find and the resemblance joins
  * (q41/q233 at τ=0.7) must NOT, which is the whole reason the
  * asymmetric operator exists.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, seed: Int): String =
    (1 to n).map(i => s"w${(i * 31 + seed * 7) % 1000}_$seed").mkString(" ")

  test("embedded doc found at containment 1.0; Jaccard join misses it") {
    implicit val s = spark
    val inner = words(30, 1)
    val outer = words(120, 2) + " " + inner + " " + words(120, 3)
    val docs = Seq((1L, inner), (2L, outer), (3L, words(40, 4)))
      .toDF("doc_id", "text")
    val pairs = DedupQueries.containmentPairs(docs, 8, 10)
      .as[(Long, Long, Long, Double)].collect()
    val hit = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(hit.isDefined, s"planted containment pair missed: ${pairs.toSeq}")
    assert(hit.get._4 == 1.0, s"verbatim embedding must score 1.0: $hit")
    // resemblance at the same corpus: J(inner, outer) ≈ 30/270 << 0.7
    val jac = DedupQueries.prefixFilterPairs(docs, 7, 10).count()
    assert(jac == 0L, "Jaccard join must not pair the embedded doc")
  }

  test("no false positives: disjoint docs produce no pairs") {
    implicit val s = spark
    val docs = Seq((1L, words(50, 5)), (2L, words(50, 6)))
      .toDF("doc_id", "text")
    assert(DedupQueries.containmentPairs(docs, 8, 10).count() == 0L)
  }

  test("direction matters: the big doc is not contained in the small one") {
    implicit val s = spark
    val inner = words(30, 1)
    val outer = words(120, 2) + " " + inner
    val docs = Seq((1L, inner), (2L, outer)).toDF("doc_id", "text")
    val pairs = DedupQueries.containmentPairs(docs, 8, 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L))
    assert(!pairs.exists(p => p._1 == 2L && p._2 == 1L),
      s"asymmetry violated: ${pairs.toSeq}")
  }
}
