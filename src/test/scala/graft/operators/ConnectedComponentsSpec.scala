package graft.operators

import graft.SparkSpec

/** Unit tests for the connected-components operator: convergence on
  * adversarial (path-shaped) graphs, multi-component separation, and
  * agreement with a driver-side union-find on a seeded random graph.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("path graph collapses to its minimum (path-halving convergence)") {
    // a 40-node path is the worst case for plain neighbor propagation
    // (O(n) rounds); with path halving it must finish well under maxIter
    val edges = (1L until 40L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate minima; direction/order ignored") {
    val edges = Seq((3L, 2L), (1L, 2L), (11L, 10L), (20L, 20L))
    val got = cc(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("checkpoint storage stays flat across rounds (generations released)") {
    // a 200-node path needs ~log2(200) ≈ 8 propagation rounds; without
    // per-round release every round would pin one more checkpoint
    // generation in executor storage
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1L until 200L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.sizeIs == 200 && got.values.forall(_ == 1L))
    val after = spark.sparkContext.getPersistentRDDs.size
    // at most the final labels generation (+ the one retired just before
    // convergence) may remain — NOT one per round
    assert(after - before <= 2,
      s"checkpoint generations leaked: $before before, $after after")
  }

  test("matches a driver-side union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 500
    val edges = Seq.fill(400)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
    assert(cc(edges) == expected)
  }
}
