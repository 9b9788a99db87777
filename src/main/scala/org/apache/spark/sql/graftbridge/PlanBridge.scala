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

  /** localCheckpoint + SIZE-STATS RESET for iterative join loops.
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
    * FRESH LogicalRDD (originStats = None → defaultSizeInBytes)
    * breaks the chain; the data is the same materialized blocks, no
    * recompute, no extra job.
    */
  def checkpointResetStats(df: Dataset[Row]): DataFrame = {
    val cp = df.asInstanceOf[classic.Dataset[Row]].localCheckpoint()
    val spark = cp.sparkSession
    val qe = cp.queryExecution
    ofRows(spark, execution.LogicalRDD(qe.analyzed.output, qe.toRdd)(spark))
  }
}
