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
