package graft.operators

import graft.SparkSpec

/** Hand 2-D layouts for DBSCAN: two dense blobs separated by more
  * than eps form two clusters, a lone faraway point is noise, a point
  * within eps of one blob but with too few neighbors of its own is a
  * border member, and a chain of core points within eps links into
  * ONE cluster (density-reachability — the property k-means lacks).
  */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Long) =
    Dbscan.cluster(pts.toDF("vec_id", "x", "y"), eps, minPts)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("two blobs, one border, one noise") {
    // blob A: 4 mutually-close points at origin; blob B: 4 at (100, 0);
    // border: 11 away from A's edge (inside eps of one A-core, deg 1);
    // noise: far from everything
    val pts = Seq(
      (1L, 0L, 0L), (2L, 3L, 0L), (3L, 0L, 3L), (4L, 3L, 3L),
      (10L, 100L, 0L), (11L, 103L, 0L), (12L, 100L, 3L), (13L, 103L, 3L),
      (20L, 14L, 0L), // within eps=12 of point 2 (dist 11) only
      (30L, 500L, 500L))
    val out = run(pts, eps = 12L, minPts = 4L)
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_)._1 == "core"), s"$out")
    assert(Seq(10L, 11L, 12L, 13L).forall(out(_)._1 == "core"), s"$out")
    assert(out(1L)._2 == 1L && out(4L)._2 == 1L)
    assert(out(10L)._2 == 10L && out(13L)._2 == 10L)
    assert(out(20L) == ("border", 1L), s"border wrong: ${out(20L)}")
    assert(out(30L) == ("noise", -1L), s"noise wrong: ${out(30L)}")
  }

  test("density chain links into one cluster") {
    // a line of points each within eps of the next — k-means would
    // split it, DBSCAN chains it
    val pts = (0 until 12).map(i => (i.toLong, i * 10L, 0L))
    val out = run(pts, eps = 12L, minPts = 3L)
    // endpoints see only ONE neighbor within eps -> border, correctly
    assert((1L to 10L).forall(out(_)._1 == "core"), s"$out")
    assert(out(0L)._1 == "border" && out(11L)._1 == "border", s"$out")
    // min CORE id labels the single chained cluster
    assert(out.values.map(_._2).toSet == Set(1L), s"chain split: $out")
  }

  test("minPts above any neighborhood makes everything noise") {
    val pts = Seq((1L, 0L, 0L), (2L, 5L, 0L), (3L, 1000L, 0L))
    val out = run(pts, eps = 10L, minPts = 5L)
    assert(out.values.forall(_ == ("noise", -1L)), s"$out")
  }

  test("negative coordinates: grid candidate generation stays complete") {
    // pair straddling the 0-cell boundary at negative coords
    val pts = Seq((1L, -5L, -5L), (2L, -15L, -5L), (3L, -25L, -5L),
      (4L, 200L, 200L))
    val out = run(pts, eps = 12L, minPts = 2L)
    assert(out(1L)._1 == "core" && out(2L)._1 == "core" && out(3L)._1 == "core")
    assert(out(1L)._2 == out(3L)._2, s"negative-coord chain split: $out")
    assert(out(4L) == ("noise", -1L))
  }

  test("nn-descent: one round improves recall past the floor (fixture)") {
    val (n, nExact, seedR, afterR) =
      Dbscan.nndStats(spark, "/root/testdata/sf0.001")
    info(s"n=$n exact=$nExact seed=${seedR} after=${afterR} permille")
    assert(n > 0 && nExact > 0)
    assert(afterR > seedR, "one round must strictly improve recall")
    assert(afterR >= Dbscan.NndAfterFloorPermille)
    // and re-running is deterministic (hash-ring seed, exact ranks)
    val again = Dbscan.nndStats(spark, "/root/testdata/sf0.001")
    assert(again == ((n, nExact, seedR, afterR)))
  }

  test("nn-descent converges to serviceable recall (q450 fixture)") {
    val (n, nExact, rounds, recallP, converged) =
      Dbscan.nndConverge(spark, "/root/testdata/sf0.001")
    info(s"n=$n exact=$nExact rounds=$rounds recall=${recallP} permille")
    assert(n > 0 && nExact > 0)
    assert(converged, "update-count termination must fire within the cap")
    assert(rounds >= 2 && rounds <= Dbscan.NndMaxRounds)
    // the serviceable floor (measured 1000 permille at every SF incl.
    // the sf1 slice; rounds grow ~log n: 5 @500, 8 @2k, 11 @20k)
    assert(recallP >= Dbscan.NndConvergedFloorPermille)
  }

  test("q468: expander seed is the gated seed; ring seed regression-pins it") {
    // Round 12 made the scalable expander seed (no single-task window)
    // THE gated convergence seed; this pin proves (a) the gated
    // default converges to the serviceable floor, and (b) the retired
    // global-ring seed still reaches the same floor but no faster —
    // the expander's mixing advantage (3 vs 5 rounds at sf0.001) is a
    // measured property, not an accident.
    val dir = "/root/testdata/sf0.001"
    val (n, _, roundsExp, recallExp, convExp) = Dbscan.nndConverge(spark, dir)
    val (_, _, roundsRing, recallRing, convRing) =
      Dbscan.nndConverge(spark, dir, seed = Dbscan.nndSeedEdges)
    info(s"n=$n expander rounds=$roundsExp recall=${recallExp} permille; " +
      s"ring rounds=$roundsRing recall=${recallRing} permille")
    assert(convExp && convRing && n > 0)
    assert(recallExp >= Dbscan.NndConvergedFloorPermille,
      s"expander (gated) seed must reach the floor, got $recallExp")
    assert(recallRing >= Dbscan.NndConvergedFloorPermille)
    assert(roundsExp <= roundsRing,
      "expander mixing must converge no slower than the ring")
  }
}
