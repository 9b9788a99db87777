package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** State TTL EVICTION — the transformWithState feature every other
  * stateful op in this library declines (`TTLConfig.NONE` everywhere,
  * e.g. [[LshDedupStream.MinOwnerProcessor]]): keyed state that
  * expires `ttl` after its last update, the bound an unbounded-key
  * stream needs when neither epoch rotation (Bloom, qs01) nor
  * watermark timers (sessionization) fit — think per-IP rate counters
  * or fraud velocity state over an open key universe, where state
  * size must track the ACTIVE key set, not the ever-seen key set.
  *
  * The processor is a per-key running count that also REPORTS whether
  * prior state existed when the batch arrived — so a test (or an
  * operator downstream) observes eviction directly: `had_state=false`
  * on a key's second batch proves the TTL fired; the count restarting
  * at the batch's own row count proves results stay correct after
  * eviction (the state machine re-enters cleanly rather than reading
  * a stale counter).
  *
  * TTL is PROCESSING-TIME semantics by definition (Spark evaluates
  * expiry against batch processing time), so the gate spec drives it
  * with margins, not equalities: a TTL of milliseconds plus a sleep
  * 10× longer MUST evict; a TTL of hours across back-to-back batches
  * MUST NOT. Both directions are safe under arbitrary scheduler
  * delay in one direction each — the determinism this feature admits.
  */
object TtlState {

  /** Per-key running count with TTL'd state; emits
    * (key, count_after_batch, had_state_before_batch).
    */
  class TtlCountProcessor(ttl: Duration)
      extends StatefulProcessor[Long, Event, (Long, Long, Boolean)] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("cnt",
        Encoders.scalaLong, TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Long, Boolean)] = {
      val had = state.exists()
      val prev = if (had) state.get() else 0L
      val next = prev + rows.size
      state.update(next)
      Iterator.single((key, next, had))
    }
  }

  /** Keyed running count over `user_id` with per-key TTL `ttl`. */
  def ttlCounts(events: Dataset[Event], ttl: Duration)
      : Dataset[(Long, Long, Boolean)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TtlCountProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update(),
        Encoders.product[(Long, Long, Boolean)])
  }
}
