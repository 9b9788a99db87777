package graft.operators

import graft.SparkSpec

/** Hand-built graphs for synchronous LPA: two cliques with one bridge
  * edge must resolve to two communities (where connected components
  * would merge them into one), ties must break to the smallest label,
  * and refits must be deterministic.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")

  test("two bridged triangles form two communities, not one component") {
    // triangle {1,2,3}, triangle {10,11,12}, bridge 3-10
    val edges = sym(Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 10L))).localCheckpoint()
    val out = LabelPropagation.propagate(edges)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L),
      s"left triangle split: $out")
    assert(out(10L) == out(11L) && out(11L) == out(12L),
      s"right triangle split: $out")
    assert(out(1L) != out(10L),
      s"bridge merged the communities: $out")
    // components would be ONE group — LPA sees density, not reachability
    val cc = ConnectedComponents(
      edges.select($"u".as("doc1"), $"v".as("doc2")),
      src = "doc1", dst = "doc2")
    val ccLabels = cc.select("comp").distinct().count()
    assert(ccLabels == 1L, "fixture must be one connected component")
  }

  test("ties break to the smallest label, deterministically") {
    // node 5 sits between two equal-size cliques: equal votes, so its
    // community must be the SMALLER winning label both runs
    val edges = sym(Seq(
      (1L, 2L), (5L, 1L), (5L, 2L),
      (8L, 9L), (5L, 8L), (5L, 9L))).localCheckpoint()
    val a = LabelPropagation.propagate(edges)
      .as[(Long, Long)].collect().toMap
    val b = LabelPropagation.propagate(edges)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "LPA not deterministic across runs")
    assert(a(5L) == math.min(a(1L), a(8L)) || a(5L) <= a(8L),
      s"tie did not break low: $a")
  }
}
