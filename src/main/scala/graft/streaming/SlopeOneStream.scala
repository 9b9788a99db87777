package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING SLOPE ONE MODEL MAINTENANCE — the incremental-view-
  * maintenance leg for a recsys MODEL (q533's deviation census kept
  * current as ratings stream in; the streaming sibling of qs22's
  * graph-index insert and qs02's CDC table apply): the (i, j) →
  * (n_ij, dsum_ij) census is COUNTER-ADDITIVE (q105 discipline), and
  * a rating change only perturbs pairs of its OWN customer's basket —
  * so each micro-batch applies the exact delta
  *   devs += pairs(touched baskets AFTER) − pairs(touched baskets BEFORE)
  * (the delta-per-group IVM form of q166's join maintenance; both
  * sides are touched-basket²-bounded, never corpus-bounded).
  *
  * Exactness gate: after the run, the incrementally-maintained census
  * must equal the from-scratch pair census of the final ratings table
  * ROW FOR ROW (both directions) — maintained ≡ recomputed is the
  * whole IVM contract.
  *
  * State lives as checkpointed frames swapped per batch (the bench
  * keeps them in-session; a durable deployment publishes them through
  * [[CdcApply]]'s snapshot-pointer discipline unchanged).
  */
object SlopeOneStream {

  /** Pair census of a `(c, p, r)` rating frame, with a sign knob so
    * the BEFORE side enters the delta negated.
    */
  def pairCensus(ratings: DataFrame, sign: Long = 1L): DataFrame = {
    val s = ratings.sparkSession
    import s.implicits._
    ratings.select($"c", $"p".as("i"), $"r".as("ri"))
      .join(ratings.select($"c", $"p".as("j"), $"r".as("rj")), "c")
      .filter($"i" =!= $"j")
      .groupBy($"i", $"j")
      .agg((count(lit(1)) * sign).as("n_ij"),
        (sum($"ri" - $"rj") * sign).as("dsum"))
  }

  /** Mutable maintained state: the ratings table and its deviation
    * census, both swapped per batch under checkpointResetStats (the
    * iterative-loop rule — each batch chains on the last).
    */
  final class DevState(s: SparkSession) {
    import s.implicits._
    var ratings: DataFrame =
      Seq.empty[(Long, Long, Long)].toDF("c", "p", "r")
    var devs: DataFrame =
      Seq.empty[(Long, Long, Long, Long)].toDF("i", "j", "n_ij", "dsum")

    /** Apply one micro-batch of rating rows (c, p, r): additive on
      * repeated (c, p) keys.
      */
    def applyBatch(batch: DataFrame): Unit = {
      if (batch.isEmpty) return
      val delta = batch.groupBy($"c", $"p").agg(sum($"r").as("dr"))
      val touched = delta.select($"c").distinct()
      val before = PlanBridge.checkpointResetStats(
        ratings.join(touched, Seq("c"), "left_semi"))
      val after = PlanBridge.checkpointResetStats(
        before.join(delta, Seq("c", "p"), "full")
          .select($"c", $"p",
            (coalesce($"r", lit(0L)) + coalesce($"dr", lit(0L))).as("r")))
      ratings = PlanBridge.checkpointResetStats(
        ratings.join(touched, Seq("c"), "left_anti").unionByName(after))
      devs = PlanBridge.checkpointResetStats(
        devs.unionByName(pairCensus(after))
          .unionByName(pairCensus(before, sign = -1L))
          .groupBy($"i", $"j")
          .agg(sum($"n_ij").as("n_ij"), sum($"dsum").as("dsum"))
          .filter($"n_ij" =!= 0L))
    }
  }

  /** Start maintaining the census from a stream of rating rows. */
  def start(state: DevState, updates: DataFrame, checkpoint: String)
      : StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state.applyBatch(batch)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** (n_ratings, n_pairs, ok): maintained ≡ from-scratch, both
    * directions.
    */
  def verifyAgainstRecompute(state: DevState): (Long, Long, Boolean) = {
    val fresh = pairCensus(state.ratings)
    val extra = state.devs.exceptAll(fresh).count()
    val missing = fresh.exceptAll(state.devs).count()
    (state.ratings.count(), fresh.count(), extra == 0L && missing == 0L)
  }
}
