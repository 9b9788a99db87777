package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q149's exact-integer z-score anomaly detection
  * (TimeSeriesQueries): per user, an event is anomalous when its
  * quantized value deviates from the user's trailing-window history by
  * more than 3σ — the same algebraically-integerized test
  * `(n·q − S)² > 9·(n·Q − S²)`, evaluated ONLINE against a bounded
  * per-key ring of the last [[AnomalyStream.WindowRows]] values held in
  * `transformWithState` ValueState.
  *
  * Semantics contract (pinned by spec against the batch window): with
  * in-order input, flagged (user_id, event_id) sets are IDENTICAL to
  * the batch `rowsBetween(-W, -1)` frame — the ring IS that frame. The
  * streaming form orders by ARRIVAL within a key (batch twin: (ts,
  * event_id)); out-of-order input changes which history a row sees —
  * callers needing event-time exactness sort per batch upstream or
  * accept arrival-order semantics (the monitoring default).
  *
  * Scale shape: state is ONE fixed-size long array per user (W values +
  * cursor) — no growth with stream length; the only exchange is the
  * user_id grouping every keyed stateful op pays. Emission is
  * anomalies-only, ∝ anomaly rate.
  */
object AnomalyStream {

  val WindowRows = 5
  val MinHistory = 3

  case class Anomaly(user_id: Long, event_id: Long, q: Long,
      n_prev: Long, s_prev: Long, qq_prev: Long)

  /** Ring state layout: [0] = count of values written (unbounded,
    * cursor = count % W), [1..W] = the last W quantized values in
    * write order.
    */
  class ZScoreProcessor(window: Int, minHistory: Int)
      extends StatefulProcessor[Long, Event, Anomaly] {
    @transient private var ring: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getValueState[Array[Byte]]("ring",
        Encoders.BINARY, TTLConfig.NONE)

    private def decode(b: Array[Byte]): Array[Long] = {
      val buf = java.nio.ByteBuffer.wrap(b)
      Array.fill(b.length / 8)(buf.getLong)
    }
    private def encode(a: Array[Long]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(a.length * 8)
      a.foreach(buf.putLong)
      buf.array()
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Anomaly] = {
      val st = if (ring.exists()) decode(ring.get())
        else new Array[Long](window + 1)
      val out = Vector.newBuilder[Anomaly]
      rows.foreach { e =>
        val q = math.floor(e.value * 100).toLong
        val written = st(0)
        val n = math.min(written, window.toLong)
        if (n >= minHistory) {
          var s = 0L; var qq = 0L
          var i = 0
          while (i < n) {
            val v = st(1 + i.toInt)
            s += v; qq += v * v
            i += 1
          }
          val dev = n * q - s
          if (dev * dev > 9L * (n * qq - s * s))
            out += Anomaly(key, e.event_id, q, n, s, qq)
        }
        st(1 + (written % window).toInt) = q
        st(0) = written + 1
      }
      ring.update(encode(st))
      out.result().iterator
    }
  }

  /** Keyed entry point: group by user, detect online. */
  def zScoreAnomalies(events: Dataset[Event], window: Int = WindowRows,
      minHistory: Int = MinHistory): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ZScoreProcessor(window, minHistory),
        TimeMode.None(), OutputMode.Update(), Encoders.product[Anomaly])
  }
}
