package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** DGIM SLIDING-WINDOW COUNTING (Datar–Gionis–Indyk–Motwani
  * SICOMP'02 "Maintaining stream statistics over sliding windows" —
  * the classic answer to "how many qualifying events in the LAST N
  * stream positions?" in O(log²N) state: the sketch family counts
  * forever (CMS qs03, HLL qs11) or time-windows with full per-window
  * state (qs19's sliding HLL); DGIM is the POSITION-window member —
  * exponentially-growing buckets whose invariant (at most
  * [[DgimPerSize]] buckets per power-of-two size, oldest pair merging
  * on overflow) bounds both the state and the error): per shard, the
  * count of events with value ≥ [[DgimThreshold]] among the last
  * [[DgimWindow]] positions, estimated as (total − oldest) +
  * ⌈oldest/2⌉.
  *
  * Guarantee (the paper's): the oldest bucket only PARTIALLY overlaps
  * the window, everything else is exact, so
  * |est − exact| ≤ ⌈oldest/2⌉ ≤ (exact + 1)/2 — the qs28 gate
  * requires |est − exact| ≤ exact/2 + 1 per shard, against the exact
  * count replayed from the fed rows.
  *
  * Determinism: the fold order is pinned to (ts, event_id) within
  * each batch (the qs17 CUSUM contract — batch-bounded sort), so
  * bucket contents are a pure function of the fed rows; the state
  * serializes canonically (position, then newest-first buckets).
  */
object DgimStream {

  /** Sliding window length, in stream positions per shard. */
  val DgimWindow = 512L
  /** Qualifying-event threshold on `value`. */
  val DgimThreshold = 500.0
  /** Max buckets per size before the oldest pair merges. */
  val DgimPerSize = 2

  /** Bucket list newest-first: (endPos, size), sizes non-decreasing
    * toward the tail; plus the running position counter.
    */
  final class DgimState(val window: Long = DgimWindow) {
    var pos = 0L
    var buckets = List.empty[(Long, Long)]

    def update(one: Boolean): Unit = {
      pos += 1L
      if (one) {
        buckets = (pos, 1L) :: buckets
        // cascade: while more than DgimPerSize buckets share a size,
        // merge the two OLDEST of that size (paper §5)
        var merged = true
        while (merged) {
          merged = false
          // cascade the SMALLEST overflowing size first (a deterministic
          // order — a 1-insert overflows size 1, whose merge may overflow
          // size 2, and so on upward)
          val overflow = buckets.groupBy(_._2)
            .filter(_._2.size > DgimPerSize)
          if (overflow.nonEmpty) {
            val sz = overflow.keys.min
            val bs = overflow(sz)
            val oldestTwo = bs.takeRight(2)
            val kept = buckets.filterNot(oldestTwo.contains)
            val mergedBucket = (oldestTwo.head._1, sz * 2L)
            // reinsert keeping newest-first order by endPos
            buckets = (mergedBucket :: kept).sortBy(-_._1)
            merged = true
          }
        }
      }
      // expire buckets that left the window entirely
      buckets = buckets.filter(_._1 > pos - window)
    }

    /** (total − oldest) + ⌈oldest/2⌉ — 0 on an empty bucket list. */
    def estimate: Long =
      if (buckets.isEmpty) 0L
      else {
        val oldest = buckets.last._2
        buckets.map(_._2).sum - oldest + (oldest + 1L) / 2L
      }

    def serialized: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(pos)
      out.writeInt(buckets.size)
      buckets.foreach { case (e, s) => out.writeLong(e); out.writeLong(s) }
      out.flush(); bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): DgimState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new DgimState
    st.pos = in.readLong()
    val n = in.readInt()
    st.buckets = (0 until n).map(_ => (in.readLong(), in.readLong())).toList
    st
  }

  /** Per-shard DGIM fold; emits (shard, position, estimate) each
    * batch (Update mode — downstream keeps the last emission).
    */
  class DgimProcessor
      extends StatefulProcessor[Long, Event, (Long, Long, Long)] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("dgim",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
      val st = if (state.exists()) deserialize(state.get())
        else new DgimState
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        .foreach(e => st.update(e.value >= DgimThreshold))
      state.update(st.serialized)
      Iterator.single((key, st.pos, st.estimate))
    }
  }

  /** Shard-and-fold entry point (the qs01/qs03 sharding discipline). */
  def dgimCounts(events: Dataset[Event], numShards: Int = 8)
      : Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), numShards).toLong
    }.transformWithState(new DgimProcessor,
      TimeMode.None(), OutputMode.Update(),
      Encoders.product[(Long, Long, Long)])
  }
}
