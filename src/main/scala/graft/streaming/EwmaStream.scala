package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One EWMA reading per (type, micro-batch). Top-level for encoder
  * codegen (the BenchCdcRow lesson).
  */
case class EwmaEmit(event_type: String, n_rows: Long, ewma_micro: Long,
    n_alarms: Long, first_alarm_n: Long)

/** Control-limit constants per key, fixed at query start from the
  * reference window: center μ₀ and the alarm half-width
  * L·σ₀·√(λ/(2−λ)), both plain doubles (ONE implementation computes
  * them and ONE implementation folds with them — stream and batch
  * twin share the code, so determinism needs no cross-engine
  * spelling contract here).
  */
case class EwmaRef(mu: Double, limit: Double)

/** Fold state: the running EWMA + counters. Constant size. */
case class EwmaSt(e: Double, n: Long, nAlarms: Long, firstAlarmN: Long)

/** Streaming EWMA CONTROL CHART (Roberts 1959) — the second half of
  * the monitoring pair q369's scaladoc prescribes ("a monitoring
  * stack runs both"): qs17's CUSUM accumulates deviations LINEARLY
  * (best against small persistent shifts), EWMA discounts them
  * GEOMETRICALLY (faster on moderate shifts, self-healing after
  * transients — no reset semantics needed). λ = 1/4 dyadic; alarm
  * when |e − μ₀| exceeds the classic L=3 limit on the EWMA's
  * stationary σ = σ₀·√(λ/(2−λ)); evaluated from the second
  * observation (e initializes to the first).
  *
  * Order contract and state bound are qs17's: per-batch (ts,
  * event_id) sort, time-ordered source, one small ValueState per key.
  */
object EwmaStream {

  /** λ = 1/4 (dyadic — exact IEEE scalings per step). */
  val Lambda = 0.25
  val LimitSigmas = 3.0

  val Zero: EwmaSt = EwmaSt(0.0, 0L, 0L, -1L)

  /** Reference constants from the exact (n, Σ, Σx²) cents moments. */
  def refOf(n: Long, s1: Long, s2: Long): EwmaRef = {
    val mu = s1.toDouble / n.toDouble
    val variance = (s2.toDouble - s1.toDouble * s1.toDouble / n.toDouble) /
      (n.toDouble - 1.0)
    EwmaRef(mu, LimitSigmas * math.sqrt(variance) *
      math.sqrt(Lambda / (2.0 - Lambda)))
  }

  /** One EWMA step; shared by the processor and the batch twin. */
  def step(st: EwmaSt, xCents: Long, ref: EwmaRef): EwmaSt = {
    val x = xCents.toDouble
    val e = if (st.n == 0L) x else Lambda * x + (1.0 - Lambda) * st.e
    val n = st.n + 1L
    val alarmed = n >= 2L && math.abs(e - ref.mu) > ref.limit
    EwmaSt(e, n, st.nAlarms + (if (alarmed) 1L else 0L),
      if (alarmed && st.firstAlarmN < 0L) n else st.firstAlarmN)
  }

  def fold(rows: Seq[Event], ref: EwmaRef, init: EwmaSt = Zero): EwmaSt =
    rows.foldLeft(init)((st, e) =>
      step(st, CusumStream.cents(e.value), ref))

  class EwmaProcessor(refs: Map[String, EwmaRef])
      extends StatefulProcessor[String, Event, EwmaEmit] {
    @transient private var st: ValueState[EwmaSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EwmaSt]("ewma",
        Encoders.product[EwmaSt], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[EwmaEmit] = {
      val ref = refs.getOrElse(key, EwmaRef(0.0, Double.MaxValue))
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val next = fold(sorted, ref, if (st.exists()) st.get() else Zero)
      st.update(next)
      Iterator.single(EwmaEmit(key, next.n,
        math.floor(1000000.0 * next.e).toLong, next.nAlarms,
        next.firstAlarmN))
    }
  }

  def ewmaStream(events: Dataset[Event],
      refs: Map[String, EwmaRef]): Dataset[EwmaEmit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new EwmaProcessor(refs), TimeMode.None(),
        OutputMode.Update(), Encoders.product[EwmaEmit])
  }
}
