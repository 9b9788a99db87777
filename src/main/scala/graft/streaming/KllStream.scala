package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.KllState

/** Streaming quantile tracking on the native KLL-family sketch
  * ([[graft.functions.KllState]], q220's aggregate) — the streaming
  * member of the sketch-state family: Bloom (membership, qs01), CMS
  * (frequency, qs03), and now KLL (distribution). Each shard folds its
  * substream into one O(k·log n) state blob; because the sketch is
  * MERGEABLE (the exact property the q220 gate certifies), the
  * shard states combine into one corpus-level sketch after any number
  * of micro-batches — continuous "p50/p90/p99 right now" over an
  * unbounded stream with constant memory, the observability shape no
  * exact method can deliver.
  */
object KllStream {

  /** q220's capacity, shared so stream and batch sketches compare. */
  val K = 200

  /** Per-shard KLL fold over the `value` stream. Emits the shard's
    * serialized state each batch (Update mode) — downstream keeps the
    * last emission per shard and merges (numShards blobs, not rows).
    */
  class KllSketchProcessor(k: Int)
      extends StatefulProcessor[Long, Event, (Long, Array[Byte])] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("kll",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Array[Byte])] = {
      val st = if (state.exists()) KllState.deserialize(state.get())
        else new KllState(k)
      rows.foreach(e => st.update(e.value))
      val bytes = st.serialized
      state.update(bytes)
      Iterator.single((key, bytes))
    }
  }

  /** Shard-and-fold entry point — the qs01/qs03 sharding discipline. */
  def kllSketches(events: Dataset[Event], numShards: Int = 8,
      k: Int = K): Dataset[(Long, Array[Byte])] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), numShards).toLong
    }.transformWithState(new KllSketchProcessor(k),
      TimeMode.None(), OutputMode.Update(),
      Encoders.product[(Long, Array[Byte])])
  }

  /** Merge serialized shard states into one sketch. */
  def merge(shards: Seq[Array[Byte]]): KllState = {
    require(shards.nonEmpty, "no shard sketches to merge")
    shards.map(KllState.deserialize)
      .reduce { (a, b) => a.merge(b); a }
  }
}
