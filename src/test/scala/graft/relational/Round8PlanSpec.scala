package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.SparkSpec

/** Physical-plan pins for the round-8 operators — the properties the
  * scaladocs PROMISE, asserted on real plans so a regression (a hint
  * dropped, an aggregate falling back to sort-based, a broadcast
  * degrading to a shuffle) fails a test instead of a 100 TB run.
  */
class Round8PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes its plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collectAll[T](p: SparkPlan)(
      f: PartialFunction[SparkPlan, T]): Seq[T] = {
    // AQE wraps finished stages in QueryStageExec; walk through them
    def walk(n: SparkPlan): Seq[T] = {
      val here = if (f.isDefinedAt(n)) Seq(f(n)) else Nil
      val kids = n match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(walk)
    }
    walk(p)
  }

  test("q295 target encoding: both statistics frames attach by broadcast") {
    val plan = executed(FeaturePrepQueries.q295TargetEncode(spark, dir))
    val bhj = collectAll(plan) { case j: BroadcastHashJoinExec => j }
    // segment stats equi-join is a BroadcastHashJoin; the 1-row global
    // frame arrives via a broadcast nested loop — no shuffle join for
    // either statistics frame
    assert(bhj.nonEmpty, s"no broadcast hash join:\n${plan.treeString}")
    val smj = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, s"statistics frame fell to sort-merge:\n${plan.treeString}")
  }

  test("q306 reservoir aggregate runs as ObjectHashAggregate with partial agg") {
    val plan = executed(SketchAggregates.q306ReservoirSample(spark, dir))
    val oha = collectAll(plan) { case a: ObjectHashAggregateExec => a }
    // partial + final = two ObjectHashAggregate nodes; map-side partials
    // are what bound the shuffle to k ids per group
    assert(oha.size >= 2,
      s"expected partial+final ObjectHashAggregate:\n${plan.treeString}")
  }

  test("q307 selection median shuffles the bucket frame, never sorts the base globally") {
    val plan = executed(SelectionMedian.q307SelectionMedian(spark, dir))
    // no global (non-partitioned) sort over the base relation: every
    // SortExec must be partition-local (the window's per-group sort) —
    // a global selection sort would show as SortExec(global=true) over
    // the lineitem scan feeding a RangePartitioning exchange
    val globalSorts = collectAll(plan) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    // only the 3-row final presentation orderBy may sort globally
    globalSorts.foreach { srt =>
      val scansBelow = collectAll(srt) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scansBelow.isEmpty,
        s"global sort directly over the base scan (selection defeated):\n${srt.treeString}")
    }
  }

  test("q304 surrogate keys: range exchange present, offsets broadcast back") {
    val plan = executed(SurrogateKeys.q304SurrogateKeys(spark, dir))
    val ranges = collectAll(plan) {
      case e: ShuffleExchangeLike
        if e.outputPartitioning
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => e
    }
    assert(ranges.nonEmpty, s"no range exchange:\n${plan.treeString}")
    val bhj = collectAll(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"offsets not broadcast:\n${plan.treeString}")
  }
}
