package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.ReservoirSample

/** Streaming deterministic k-SAMPLE via bottom-k state — the
  * streaming twin of the [[graft.functions.ReservoirSample]] batch
  * aggregate, and the sixth leg of the sketch-state family:
  * membership (qs01), frequency (qs03), distribution (qs08),
  * approximate cardinality (qs11), exact set (qs12), and now a
  * UNIFORM SAMPLE of the keys seen — the state a pipeline keeps when
  * downstream wants representative examples, not counts.
  *
  * Same semilattice as the batch aggregate: bottom-k by md5 priority
  * over event ids. min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)) makes
  * the fold order-independent, so streamed ≡ batch at ANY micro-batch
  * slicing and the shard merge is lossless — the spec asserts literal
  * id-for-id equality against the batch aggregate, a stronger gate
  * than any sketch leg can offer. State per shard is EXACTLY k
  * (priority, id) pairs — constant, never growing with the stream.
  */
object ReservoirStream {

  val K = 64

  private val ord = Ordering.Tuple2[Long, Long](Ordering.Long, Ordering.Long)

  private def fold(buf: Array[(Long, Long)], p: Long, id: Long, k: Int)
      : Array[(Long, Long)] = {
    // buf is kept sorted ascending; bounded at k entries
    if (buf.length < k || ord.lt((p, id), buf.last)) {
      val merged = (buf :+ ((p, id))).sorted.distinct
      if (merged.length > k) merged.take(k) else merged
    } else buf
  }

  /** Per-shard bottom-k fold over event ids; emits the shard's
    * serialized (priority, id) pairs each batch (Update mode).
    */
  class ReservoirProcessor(k: Int)
      extends StatefulProcessor[Long, Event, (Long, Array[Byte])] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("rsv",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Array[Byte])] = {
      var buf = if (state.exists()) decode(state.get())
        else Array.empty[(Long, Long)]
      rows.foreach { e =>
        buf = fold(buf, ReservoirSample.priority(e.event_id), e.event_id, k)
      }
      val bytes = encode(buf)
      state.update(bytes)
      Iterator.single((key, bytes))
    }
  }

  def encode(pairs: Array[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + pairs.length * 16)
    bb.putInt(pairs.length)
    pairs.foreach { case (p, id) => bb.putLong(p); bb.putLong(id) }
    bb.array()
  }

  def decode(bytes: Array[Byte]): Array[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt)((bb.getLong, bb.getLong))
  }

  /** Shard-and-fold entry point (the qs11/qs12 sharding discipline). */
  def reservoirShards(events: Dataset[Event], k: Int = K,
      numShards: Int = 8): Dataset[(Long, Array[Byte])] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), numShards).toLong
    }.transformWithState(new ReservoirProcessor(k),
      TimeMode.None(), OutputMode.Update(),
      Encoders.product[(Long, Array[Byte])])
  }

  /** Lossless shard merge: bottom-k across the shard bottom-ks. */
  def merge(shards: Seq[Array[Byte]], k: Int = K): Seq[Long] =
    shards.flatMap(decode).distinct.sorted.take(k).map(_._2)
}
