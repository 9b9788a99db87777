package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One CUSUM reading per (type, micro-batch): cumulative rows folded,
  * the two scaled one-sided statistics, the cumulative alarm count and
  * the row index of the first alarm (−1 = never). Top-level: encoder
  * codegen cannot see inside objects (the BenchCdcRow lesson).
  */
case class CusumEmit(event_type: String, n_rows: Long, s_pos: Long,
    s_neg: Long, n_alarms: Long, first_alarm_n: Long)

/** Reference-window mean as the exact rational (Σ cents, n). */
case class CusumRef(muNum: Long, muDen: Long)

/** Fold state — the whole per-key memory of the monitor: two scaled
  * partial sums and three counters. Constant size (the qs01/qs03/qs16
  * state contract).
  */
case class CusumSt(sPos: Long, sNeg: Long, n: Long, nAlarms: Long,
    firstAlarmN: Long)

/** Streaming CUSUM ALARM monitor (Page 1954, the online one-sided
  * form) — the ALERT leg the drift family gained qs16's PSI reading
  * but not a trigger for: PSI says "the distribution moved", CUSUM
  * says "raise the pager NOW, the level shifted" — it accumulates
  * small persistent deviations a per-point z-score (qs04) never flags,
  * and it is the sibling with MEMORY of q292's offline argmax form.
  *
  *   S⁺ ← max(0, S⁺ + (x − μ₀ − k)),  S⁻ ← max(0, S⁻ + (μ₀ − x − k)),
  *   alarm & reset when either exceeds h.
  *
  * EXACT INTEGER arithmetic throughout: μ₀ is the reference mean as a
  * rational (Σcents, n), and both statistics are kept SCALED by the
  * denominator — S'⁺ = max(0, S'⁺ + n_ref·x_cents − Σ_ref − k·n_ref) —
  * so there is no float anywhere and stream-vs-batch equivalence is
  * exact equality (the qs16 gate discipline).
  *
  * ORDER is part of CUSUM's definition (unlike qs16's counter-additive
  * histogram): the fold order is pinned to (ts, event_id) WITHIN each
  * micro-batch (transformWithState hands rows in arbitrary shuffle
  * order; the per-batch sort is batch-bounded), and batches arrive in
  * time order by the source contract — the same contract an event-time
  * ordered production topic provides per key. Cross-slicing invariance
  * under that contract is what the spec proves.
  *
  * State: 5 longs per key, constant in rows. Alarm semantics: RESET
  * both sides to 0 after an alarm (restart detection — the standard
  * monitoring convention, pinned here as contract).
  */
object CusumStream {

  /** k = σ/2 and h = 5σ of the events fixture's value scale (mean ≈
    * 50.0, σ ≈ 50.0 units → cents), the classic CUSUM design point
    * (detects a 1σ level shift with ARL₀ ≈ 930).
    */
  val SlackCents = 2500L
  val ThresholdCents = 25000L

  val Zero: CusumSt = CusumSt(0L, 0L, 0L, 0L, -1L)

  /** One exact-integer CUSUM step; shared verbatim by the streaming
    * processor and the batch twin the gates replay.
    */
  def step(st: CusumSt, xCents: Long, ref: CusumRef): CusumSt = {
    val drift = ref.muDen * xCents - ref.muNum
    val slack = SlackCents * ref.muDen
    val h = ThresholdCents * ref.muDen
    val sp = math.max(0L, st.sPos + drift - slack)
    val sn = math.max(0L, st.sNeg - drift - slack)
    val n = st.n + 1L
    if (sp > h || sn > h)
      CusumSt(0L, 0L, n, st.nAlarms + 1L,
        if (st.firstAlarmN < 0L) n else st.firstAlarmN)
    else CusumSt(sp, sn, n, st.nAlarms, st.firstAlarmN)
  }

  def cents(value: Double): Long = math.floor(100.0 * value).toLong

  /** Batch twin: fold rows already in (ts, event_id) order. */
  def fold(rows: Seq[Event], ref: CusumRef,
      init: CusumSt = Zero): CusumSt =
    rows.foldLeft(init)((st, e) => step(st, cents(e.value), ref))

  class CusumProcessor(refs: Map[String, CusumRef])
      extends StatefulProcessor[String, Event, CusumEmit] {
    @transient private var st: ValueState[CusumSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumSt]("cusum",
        Encoders.product[CusumSt], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[CusumEmit] = {
      val ref = refs.getOrElse(key, CusumRef(0L, 1L))
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val next = fold(sorted, ref,
        if (st.exists()) st.get() else Zero)
      st.update(next)
      Iterator.single(CusumEmit(key, next.n, next.sPos, next.sNeg,
        next.nAlarms, next.firstAlarmN))
    }
  }

  /** Keyed monitor entry point (Update mode; latest emission per type
    * = max n_rows, the monotone fold count — qs16's convention).
    */
  def cusumStream(events: Dataset[Event],
      refs: Map[String, CusumRef]): Dataset[CusumEmit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(refs), TimeMode.None(),
        OutputMode.Update(), Encoders.product[CusumEmit])
  }
}
