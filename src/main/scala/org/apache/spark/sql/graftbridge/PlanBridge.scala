package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` Dataset/plan seams a library needs to
  * ship a custom logical operator: build a DataFrame from a LogicalPlan
  * (`Dataset.ofRows` is private[sql] on Spark 4), read a frame's
  * analyzed plan, and install a planner strategy on a LIVE session
  * (`spark.sql.extensions` covers only sessions built after the conf is
  * set; `experimental.extraStrategies` is the sanctioned runtime hook).
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: Dataset[Row]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Idempotently append a planner strategy to the live session. */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Idempotently append an optimizer rule to the live session. */
  def addOptimization(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule))
      exp.extraOptimizations = exp.extraOptimizations :+ rule
  }

  /** localCheckpoint + TRUTHFUL SIZE STATS for iterative join loops.
    *
    * `Dataset.localCheckpoint` builds its `LogicalRDD` with
    * `originStats = optimizedPlan.stats`, so the size estimate of the
    * PREVIOUS iteration survives the checkpoint; Catalyst's
    * size-only join estimator then MULTIPLIES child estimates
    * (SizeInBytesOnlyStatsPlanVisitor.visitJoin), which means k
    * checkpointed join rounds compound into a sizeInBytes BigInt with
    * O(cᵏ) bits — measured on the NN-Descent serve loop: per-hop
    * driver time grew 0.7 s → 127 s purely in BigInteger
    * multiplications inside stats estimation, with every executor
    * idle. Rebuilding the frame from the checkpointed RDD through a
    * FRESH LogicalRDD breaks the chain; the data is the same
    * materialized blocks, no recompute, no extra job.
    *
    * Round 12: the fresh LogicalRDD now carries the MEASURED size of
    * the just-materialized checkpoint blocks (BlockManager
    * memSize+diskSize) instead of `None`→defaultSizeInBytes. Round
    * 11's plain reset was estimate-free, so every checkpointed frame
    * looked huge and the prefix-doubling/NN-Descent loops lost their
    * pre-AQE broadcast-hash picks (q451 11.0→14.2 s at sf0.1,
    * BASELINE.md:141 — the accepted regression this closes). Measured
    * bytes cannot compound (each checkpoint re-reads its own blocks,
    * never the previous estimate), stay honest at ANY scale (a 100 TB
    * frame reports 100 TB and is never broadcast), and if the storage
    * info is missing the stats fall back to None = round 11 behavior.
    */
  def checkpointResetStats(df: Dataset[Row]): DataFrame = {
    val cp = df.asInstanceOf[classic.Dataset[Row]].localCheckpoint()
    val spark = cp.sparkSession
    val qe = cp.queryExecution
    val blockSize = qe.analyzed.collectFirst {
      case lr: execution.LogicalRDD => lr.rdd.id
    }.flatMap(id => spark.sparkContext.getRDDStorageInfo.find(_.id == id))
      .map(i => BigInt(i.memSize + i.diskSize)).filter(_ > 0)
    val stats = blockSize.map(s =>
      catalyst.plans.logical.Statistics(sizeInBytes = s))
    ofRows(spark, execution.LogicalRDD(qe.analyzed.output, qe.toRdd)(
      spark, stats, None))
  }

  /** localCheckpoint that KEEPS a hash clustering (r17 optimization,
    * guide §2.4 "two operations keyed the same way can share one
    * exchange").
    *
    * Under AQE (on by default) `Dataset.localCheckpoint` rebuilds the
    * frame with UnknownPartitioning — AdaptiveSparkPlanExec cannot
    * promise a partitioning before execution — so every consumer of a
    * checkpointed frame re-shuffles even when the frame was JUST
    * repartitioned by exactly the key the consumer needs (measured on
    * q312: 28-exchange plan, the 8M-row scoring fan-out re-shuffled
    * twice). This helper repartitions by `cols` into an EXPLICIT
    * partition count (explicit so AQE cannot coalesce it — a coalesced
    * exchange's bucket→partition map would falsify the claim below;
    * REPARTITION_BY_NUM shuffles are likewise exempt from AQE's
    * local-shuffle-read and skew-split rewrites, which only apply to
    * ENSURE_REQUIREMENTS exchanges), materializes, and rebuilds the
    * LogicalRDD declaring the TRUE HashPartitioning of the
    * materialized blocks. Downstream groupBy/window/join/top-k keyed
    * by any superset of `cols` then satisfies ClusteredDistribution
    * with no exchange. The declared-partitioning ⟺ true-layout
    * equivalence is pinned by PlanBridgeSpec on a skewed fixture (r17
    * advice): a silent falsification would return wrong results, not
    * a slow plan.
    *
    * `cols` must be non-empty and unambiguous in `df`'s output — an
    * empty clustering or a duplicate name would silently bind the
    * wrong attribute and declare a partitioning the blocks don't have.
    *
    * Stats discipline: same measured-size reset as
    * [[checkpointResetStats]] (originStats must not survive — see that
    * method's scaladoc for the O(cᵏ) compounding).
    */
  def checkpointKeepHashPartitioning(df: Dataset[Row], cols: Seq[String],
      numParts: Int): DataFrame = {
    require(cols.nonEmpty,
      "checkpointKeepHashPartitioning needs a non-empty clustering")
    cols.foreach { c =>
      val n = df.schema.count(_.name == c)
      require(n == 1, s"clustering column $c is " +
        s"${if (n == 0) "missing" else "ambiguous"} in " +
        df.schema.fieldNames.mkString("[", ", ", "]"))
    }
    val cp = df.repartition(numParts, cols.map(df.col): _*)
      .asInstanceOf[classic.Dataset[Row]].localCheckpoint()
    val spark = cp.sparkSession
    val qe = cp.queryExecution
    val out = qe.analyzed.output
    val exprs = cols.map { c =>
      val hits = out.filter(_.name == c)
      require(hits.size == 1,
        s"column $c is ${if (hits.isEmpty) "missing" else "ambiguous"} " +
          s"in ${out.map(_.name)}")
      hits.head
    }
    val part = catalyst.plans.physical.HashPartitioning(exprs, numParts)
    val blockSize = qe.analyzed.collectFirst {
      case lr: execution.LogicalRDD => lr.rdd.id
    }.flatMap(id => spark.sparkContext.getRDDStorageInfo.find(_.id == id))
      .map(i => BigInt(i.memSize + i.diskSize)).filter(_ > 0)
    val stats = blockSize.map(s =>
      catalyst.plans.logical.Statistics(sizeInBytes = s))
    ofRows(spark, execution.LogicalRDD(out, qe.toRdd, part, Nil, false)(
      spark, stats, None))
  }
}
