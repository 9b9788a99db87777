package graft.operators

import graft.SparkSpec

/** Semantic gates for bounded-hop Bellman–Ford (q231): relaxation must
  * prefer a cheaper multi-edge path over a direct edge, respect the hop
  * bound, and leave unreachable nodes absent.
  */
class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  test("two-hop detour beats expensive direct edge") {
    // 1 -(10)-> 2, 1 -(1)-> 3 -(2)-> 2 : dist(2) must be 3, not 10
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L))
      .toDF("u", "v", "w").localCheckpoint()
    val d = ShortestPaths.boundedSssp(edges, 1L, hops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 3L, 3L -> 1L))
  }

  test("hop bound truncates: a 3-edge-only path needs 3 rounds") {
    // chain 1 -> 2 -> 3 -> 4, unit weights
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("u", "v", "w").localCheckpoint()
    val d2 = ShortestPaths.boundedSssp(edges, 1L, hops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!d2.contains(4L), "node 4 is 3 hops out; absent at hops=2")
    val d3 = ShortestPaths.boundedSssp(edges, 1L, hops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3(4L) == 3L)
  }

  test("disconnected nodes never appear") {
    val edges = Seq((1L, 2L, 1L), (8L, 9L, 1L))
      .toDF("u", "v", "w").localCheckpoint()
    val d = ShortestPaths.boundedSssp(edges, 1L, hops = 3)
      .collect().map(r => r.getLong(0)).toSet
    assert(d == Set(1L, 2L))
  }
}
