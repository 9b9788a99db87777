package graft.operators

import graft.SparkSpec

/** Exactness + monotonicity pins for the Louvain move phase. */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")

  test("qScore is the exact 4m^2-scaled modularity on two triangles") {
    // two disjoint triangles, perfectly labeled: 2m = 12, each
    // community has E_c = 6 directed internal rows and D_c = 6, so
    // score = 2 * (12*6 - 36) = 72
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    assert(Louvain.qScore(edges, labels, 12L) == 72L)
    // everything in one community scores 0 (E = 2m, D = 2m)
    val one = (1L to 6L).map(n => (n, 1L)).toDF("node", "label")
    assert(Louvain.qScore(edges, one, 12L) == 0L)
  }

  test("refine is monotone and finds the two-triangle split") {
    // bridged triangles: the singleton start must strictly improve and
    // never regress (accept-if-improved is the invariant under test)
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)))
      .localCheckpoint()
    val single = edges.select($"u".as("node")).distinct()
      .withColumn("label", $"node")
    val (labels, start, end, accepted) = Louvain.refine(edges, single)
    info(s"start=$start end=$end accepted=$accepted")
    assert(end >= start)
    assert(end > start, "moves must find structure on a modular graph")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L), s"triangles merged: $got")
  }

  test("q452 fixture gate: optimizer strictly beats LPA at sf0.001") {
    val rows = Louvain.q452Louvain(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(5)), "ok gate must hold")
  }
}
