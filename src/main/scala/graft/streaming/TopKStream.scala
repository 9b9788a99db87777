package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-group TOP-K — the stateful twin of the custom
  * bounded-heap plan (plans/TopKPerGroup.scala): the batch operator
  * keeps an O(k) heap per group within one job; this processor keeps
  * the same O(k) summary per key ACROSS micro-batches in
  * `transformWithState` ValueState, so a continuous "top k events per
  * user" feed never re-sorts history. Top-k is a mergeable summary
  * (the q105/q122 decomposability argument): merging each batch's
  * candidates into the retained k is lossless, which is exactly why
  * the batch operator's mid-group spill splits are lossless too.
  *
  * Ordering contract mirrors q156: (quantized value desc, event_id
  * asc) — the value is quantized `floor(100·v)` (the q149 convention)
  * so the order is integer-exact, and the unique event_id tiebreak
  * makes every emission deterministic.
  *
  * State: one byte-packed array of ≤ k (q, event_id) pairs plus the
  * processed-row count per key — constant in stream length. Emission:
  * the key's current top-k with a `ver` stamp (rows processed so far);
  * downstream keeps the max-ver rows per key (the spec does exactly
  * this), so the latest summary is always recoverable from an
  * update-mode sink.
  */
object TopKStream {

  val K = 3

  case class TopKRow(user_id: Long, rank: Int, event_id: Long, q: Long,
      ver: Long)

  class GroupTopKProcessor(k: Int)
      extends StatefulProcessor[Long, Event, TopKRow] {
    @transient private var st: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("topk",
        Encoders.BINARY, TTLConfig.NONE)

    private def decode(b: Array[Byte]): (Long, List[(Long, Long)]) = {
      val buf = java.nio.ByteBuffer.wrap(b)
      val n = buf.getLong
      val m = (b.length / 8 - 1) / 2
      (n, List.fill(m)((buf.getLong, buf.getLong)))
    }

    private def encode(n: Long, top: List[(Long, Long)]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 * (1 + 2 * top.length))
      buf.putLong(n)
      top.foreach { case (q, id) => buf.putLong(q); buf.putLong(id) }
      buf.array()
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[TopKRow] = {
      val (n0, top0) =
        if (st.exists()) decode(st.get()) else (0L, Nil)
      var n = n0
      val cands = rows.map { e =>
        n += 1
        (math.floor(100.0 * e.value).toLong, e.event_id)
      }.toList
      val merged = (top0 ++ cands)
        .sortBy { case (q, id) => (-q, id) }
        .take(k)
      st.update(encode(n, merged))
      merged.zipWithIndex.iterator.map { case ((q, id), i) =>
        TopKRow(key, i + 1, id, q, n)
      }
    }
  }

  /** Continuous top-[[K]] per user over an event stream. */
  def topKPerUser(events: Dataset[Event], k: Int = K): Dataset[TopKRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new GroupTopKProcessor(k), TimeMode.None(),
        OutputMode.Update(), Encoders.product[TopKRow])
  }
}
