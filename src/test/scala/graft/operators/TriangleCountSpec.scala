package graft.operators

import graft.SparkSpec

class TriangleCountSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    TriangleCount.triangles(edges.toDF("u", "v"))
      .as[(Long, Long, Long, Long)].head()

  test("hand-built graph: K4 plus a pendant edge") {
    // K4 on {1,2,3,4} has 4 triangles, 6 edges, and C(3,2)-per-vertex
    // wedges at the orientation's low endpoints; node 5 hangs off 4.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val (nodes, es, _, tri) = census(edges)
    assert(nodes === 5 && es === 7 && tri === 4)
  }

  test("triangle-free graph counts zero") {
    // a 4-cycle plus a star: wedges exist, no triangle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (5L, 1L), (5L, 6L), (5L, 7L))
    val (_, _, wedges, tri) = census(edges)
    assert(tri === 0 && wedges > 0)
  }

  test("each triangle counted exactly once regardless of degree skew") {
    // hub node 100 in every triangle; skew must not double-count
    val edges = Seq((1L, 2L), (1L, 100L), (2L, 100L),
      (3L, 4L), (3L, 100L), (4L, 100L),
      (5L, 6L), (5L, 100L), (6L, 100L))
    val (_, _, _, tri) = census(edges)
    assert(tri === 3)
  }
}
