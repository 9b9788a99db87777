package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property gates for the round-8 allocation / ML-prep / stats
  * operators — invariants the DuckDB hash compare does not state
  * explicitly (it proves equality, these prove MEANING).
  */
class Round8OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q298 FIFO conservation: matched total = min(buys, sells) per part") {
    import spark.implicits._
    val matched = AllocationQueries.q298FifoMatch(spark, dir)
      .groupBy($"l_partkey").agg(sum($"matched_qty").as("m"))
    val li = graft.core.Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_returnflag",
        expr("CAST(FLOOR(l_quantity) AS BIGINT)").as("q"))
    val totals = li.groupBy($"l_partkey").agg(
      sum(when($"l_returnflag" === "N", $"q").otherwise(0L)).as("b"),
      sum(when($"l_returnflag" === "R", $"q").otherwise(0L)).as("s"))
    val bad = totals.join(matched, Seq("l_partkey"), "left")
      .filter(least($"b", $"s") > 0)
      .filter(coalesce($"m", lit(0L)) =!= least($"b", $"s"))
      .count()
    assert(bad === 0)
    // every match strictly positive
    assert(AllocationQueries.q298FifoMatch(spark, dir)
      .filter($"matched_qty" <= 0).count() === 0)
  }

  test("q299 position attribution: credits sum to exactly 1e6 per conversion") {
    import spark.implicits._
    val bad = AllocationQueries.q299PositionAttribution(spark, dir)
      .groupBy($"conv_id").agg(sum($"credit_micro").as("s"))
      .filter($"s" =!= 1000000L).count()
    assert(bad === 0)
  }

  test("q300 gap audit: gaps + surviving ids tile the id range exactly") {
    import spark.implicits._
    val ids = graft.core.Tables.events(spark, dir)
      .filter($"event_type" =!= "error").select($"event_id".as("id"))
    val (mn, mx, n) = ids.agg(min($"id"), max($"id"), count(lit(1)))
      .as[(Long, Long, Long)].head()
    val missing = AllocationQueries.q300GapAudit(spark, dir)
      .agg(coalesce(sum($"n_missing"), lit(0L))).as[Long].head()
    assert(n + missing === mx - mn + 1)
  }

  test("q302 Poisson bootstrap: weights are non-negative and mean ~ 1") {
    import spark.implicits._
    val reps = StatInference.q302PoissonBootstrap(spark, dir)
      .select($"b", $"n_eff").as[(Int, Long)].collect()
    assert(reps.length === StatInference.BootReps)
    val nOrders = graft.core.Tables.orders(spark, dir).count()
    // E[n_eff] = n; 4-sigma envelope with Var = n per replicate
    val tol = 4.0 * math.sqrt(nOrders.toDouble)
    reps.foreach { case (_, nEff) =>
      assert(math.abs(nEff - nOrders).toDouble <= tol,
        s"replicate weight mass $nEff vs $nOrders")
    }
  }

  test("q304 surrogate keys: dense, contiguous, order-preserving") {
    import spark.implicits._
    val out = SurrogateKeys.q304SurrogateKeys(spark, dir)
      .select($"c_custkey", $"sk").as[(Long, Long)].collect()
    val n = out.length
    assert(out.map(_._2).toSeq === (1L to n).toSeq)
    assert(out.map(_._1).toSeq === out.map(_._1).sorted.toSeq)
  }

  test("q293 Kaplan-Meier: risk set telescopes (n_risk - d - c chains)") {
    import spark.implicits._
    val rows = StatInference.q293KaplanMeier(spark, dir)
      .select($"dur", $"n_risk", $"n_event", $"n_censor")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((_, r0, e0, c0), (_, r1, _, _)) =>
        assert(r1 === r0 - e0 - c0)
      case _ => ()
    }
    // first risk set is the full cohort
    val users = graft.core.Tables.events(spark, dir)
      .select($"user_id").distinct().count()
    assert(rows.head._2 === users)
  }
}
