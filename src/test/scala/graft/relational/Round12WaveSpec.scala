package graft.relational

import graft.SparkSpec

/** Fixture pins for the round-12 widening wave (q469+). */
class Round12WaveSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q469: planted extreme lands in the shallowest octile of the forest") {
    val (n, plantScore, le, mn, mx): (Long, Long, Long, Long, Long) =
      graft.operators.IsolationTree.forestStats(spark, dir)
    info(s"n=$n plant=$plantScore organic<=plant: $le min=$mn max=$mx")
    assert(n > 0 && mn < mx)
    assert(8L * le <= n,
      "forest score must beat the single-tree quartile gate with margin")
  }

  test("q470: layered descent reaches the flat walk's recall floor " +
      "from one entry and fewer base hops") {
    val (nq, hits, recall, layers, converged) =
      graft.operators.Hnsw.layeredServeStats(spark, dir)
    info(s"nq=$nq hits=$hits recall=${recall} permille layers=$layers")
    assert(converged && nq > 0 && layers >= 1)
    assert(recall >= graft.operators.GraphServe.ServeRecallFloorPermille)
    // the hierarchy's point: 1 entry vs 32, 6 base hops vs 10
    assert(graft.operators.Hnsw.BaseHops < graft.operators.GraphServe.Hops)
  }

  test("q471: the LCP array answers a sub-8 threshold the rank-overlap " +
      "trick cannot") {
    import org.apache.spark.sql.functions._
    val out = graft.llm.SuffixArray.q471LcpDedupSpans(spark, dir)
      .groupBy($"k").agg(count(lit(1)).as("docs"),
        sum($"covered_tokens").as("cov")).orderBy($"k").collect()
    assert(out.length == 2, "both thresholds must produce spans")
    val (k5, k10) = (out(0), out(1))
    assert(k5.getLong(0) == 5L && k10.getLong(0) == 10L)
    // k=5 is strictly more permissive: at least as many covered tokens
    assert(k5.getAs[Long]("cov") >= k10.getAs[Long]("cov"))
  }

  test("qs21: streamed beam-serve answers equal the one-shot batch walk") {
    // the entry's internal require() IS the slicing-independence gate
    // (per-batch walks must reproduce the full-set walk answer for
    // answer); this pins it at spec time on the fixture
    val row = graft.streaming.StreamBench.qs21BeamServeStream(
      spark, dir).collect().head
    assert(row.getAs[Long]("n_queries") > 0)
    assert(row.getAs[Long]("n_batches") ==
      graft.streaming.StreamBench.BloomBatches.toLong)
  }

  test("q469: the ensemble average reduces variance vs single trees") {
    import org.apache.spark.sql.functions._
    // Two independent 4-tree half-forest means must disagree LESS on
    // the same organic events than two independent single trees do —
    // the Var/T concentration that makes the ensemble the Liu et al.
    // contract (a single tree's path length is one random draw).
    val f = graft.operators.IsolationTree.forestFrame(spark, dir)
      .filter($"event_id" =!= -1L)
    val row = f.agg(
      avg(abs(($"t0" + $"t1" + $"t2" + $"t3") / 4.0 -
        ($"t4" + $"t5" + $"t6" + $"t7") / 4.0)).as("half_gap"),
      avg(abs($"t0" - $"t4")).as("single_gap")).head()
    val (halfGap, singleGap) = (row.getDouble(0), row.getDouble(1))
    info(f"half-forest gap=$halfGap%.0f single-tree gap=$singleGap%.0f micro")
    assert(halfGap < singleGap,
      "4-tree half-forest means must agree better than single trees")
  }
}
