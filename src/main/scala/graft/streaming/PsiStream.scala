package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One PSI reading: cumulative rows folded for the type (monotone —
  * the "which emission is latest" key Update mode needs), bins in the
  * union of reference and current support, and the micro-quantized
  * PSI. Top-level: Spark's encoder codegen cannot instantiate a case
  * class nested inside an object (the [[BenchCdcRow]] lesson).
  */
case class PsiEmit(event_type: String, n_rows: Long, n_bins: Long,
    psi_micro: Long)

/** Streaming POPULATION STABILITY INDEX drift monitor — the streaming
  * twin of q314's batch PSI
  * ([[graft.relational.StatInference.q314PsiDrift]]), closing the
  * drift family the way CmsStream/HllStream close frequency and
  * cardinality: a 100 TB ingest's FIRST monitor is "does today's
  * corpus still look like the reference?", and it must answer per
  * micro-batch, not per nightly re-scan.
  *
  * Design for order-independence (the gate's hinge): per-type state is
  * the exact bin→count histogram — counts are COUNTER-ADDITIVE, so the
  * folded state after any micro-batch slicing equals the batch
  * groupBy count over the same rows, exactly. PSI itself is a
  * deterministic finish over (reference, state) computed by ONE shared
  * function ([[PsiStream.psiMicro]]) on both the streaming and batch
  * sides: per-bin terms are micro-quantized to BIGINT and summed
  * order-free (the q230/q314 convention), so stream-vs-batch
  * equivalence is exact equality, not a tolerance band.
  *
  * The reference histogram is FIXED at query start (the monitoring
  * contract: reference = a vetted baseline window, e.g. the corpus the
  * deployed model trained on) and rides into the processor as a
  * broadcast-sized constructor argument — types × occupied bins rows,
  * the same bounded frame q314's window-halves comparison builds.
  *
  * State size: one long per OCCUPIED (type, bin) — bins are fixed
  * 20.00-unit value buckets, so state is bounded by the value range,
  * constant in row count (the qs01/qs03 contract).
  */
object PsiStream {

  /** q314's bin width and Laplace smoothing, shared so the twins are
    * comparable readings of the same metric.
    */
  val BinCents: Long = graft.relational.StatInference.PsiBinCents
  val Smooth: Long = graft.relational.StatInference.PsiSmooth

  /** q314's bin spelling — CAST(FLOOR(100*value) AS BIGINT) div width.
    * Scala's `/` on Longs truncates toward zero exactly like Spark's
    * `div` (event values are non-negative, so floor-vs-truncate cannot
    * diverge here, as q314's cross-engine gate already established).
    */
  def binOf(value: Double): Long =
    math.floor(100.0 * value).toLong / BinCents

  /** The ONE shared PSI finish: union-of-support bins, +Smooth on both
    * sides, per-bin term (p−q)·ln(p/q) computed in doubles from exact
    * BIGINT counts, micro-quantized to BIGINT, summed order-free.
    * Returns (n_bins, psi_micro).
    */
  def psiMicro(ref: Map[Long, Long], cur: Map[Long, Long]): (Long, Long) = {
    val bins = ref.keySet ++ cur.keySet
    var ta = 0L; var tb = 0L
    bins.foreach { b =>
      ta += ref.getOrElse(b, 0L) + Smooth
      tb += cur.getOrElse(b, 0L) + Smooth
    }
    var s = 0L
    bins.foreach { b =>
      val pa = (ref.getOrElse(b, 0L) + Smooth).toDouble / ta.toDouble
      val pb = (cur.getOrElse(b, 0L) + Smooth).toDouble / tb.toDouble
      s += math.floor(1000000.0 * ((pa - pb) * math.log(pa / pb))).toLong
    }
    (bins.size.toLong, s)
  }

  /** Exact (type, bin) histogram of a static frame, collected to a
    * driver map — used for the fixed REFERENCE only, which is bounded
    * by types × occupied bins (not rows) by construction.
    */
  def histogram(events: DataFrame): Map[String, Map[Long, Long]] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"event_type",
        expr(s"CAST(FLOOR(100 * value) AS BIGINT) div $BinCents").as("bin"))
      .groupBy($"event_type", $"bin").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.map(r => r._2 -> r._3).toMap
      }
  }

  /** Per-type histogram fold + PSI emission. Each batch re-reads only
    * the bins it touches plus one full pass over the (bounded) bin map
    * for the finish — state I/O stays proportional to occupied bins.
    */
  class PsiProcessor(ref: Map[String, Map[Long, Long]])
      extends StatefulProcessor[String, Event, PsiEmit] {
    @transient private var bins: MapState[Long, Long] = _
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      bins = getHandle.getMapState[Long, Long]("bins",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[PsiEmit] = {
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { e =>
        val b = binOf(e.value)
        val c = if (bins.containsKey(b)) bins.getValue(b) else 0L
        bins.updateValue(b, c + 1L)
        n += 1L
      }
      seen.update(n)
      val cur = bins.iterator().map { case (k, v) => (k, v) }.toMap
      val (nb, psi) = psiMicro(ref.getOrElse(key, Map.empty), cur)
      Iterator.single(PsiEmit(key, n, nb, psi))
    }
  }

  /** Keyed monitor entry point: every micro-batch, each event type
    * that received rows re-emits its cumulative PSI against the fixed
    * reference (Update mode — downstream keeps the max-n_rows row per
    * type, which is the latest because n_rows is monotone).
    */
  def psiStream(events: Dataset[Event],
      ref: Map[String, Map[Long, Long]]): Dataset[PsiEmit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new PsiProcessor(ref), TimeMode.None(),
        OutputMode.Update(), Encoders.product[PsiEmit])
  }
}
