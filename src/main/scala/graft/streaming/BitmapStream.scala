package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.BitmapCodec

/** Streaming EXACT distinct state via Roaring bitmaps — the fifth leg
  * of the sketch-state family and the exact complement of
  * [[HllStream]] (qs11): membership (qs01), frequency (qs03),
  * distribution (qs08), approximate cardinality (qs11), and now the
  * exact SET itself. Each shard folds its substream's keys into a
  * compressed bitmap in ValueState; bitmap OR is order-independent and
  * commutes across shards, so streamed ≡ batch at any micro-batch
  * slicing and the shard-merge loses nothing (the q265/q271 batch
  * algebra, lifted into the stream).
  *
  * The honest state trade, scaladoc'd rather than hidden: HLL state is
  * CONSTANT (2^lgK registers) but approximate; bitmap state grows with
  * the shard's distinct-key count — Roaring-compressed (dense ranges
  * ~2 bits/key, runs O(1)), which at warehouse user-id densities is
  * routinely smaller than the raw key set by 10-100×, but still
  * unbounded in the adversarial sparse-key regime. Pick qs11 when the
  * question is "how many"; pick this when downstream needs exact
  * counts, set algebra (overlap of live audiences), or the keys
  * themselves back.
  */
object BitmapStream {

  /** Per-shard bitmap fold over the `user_id` stream. Emits the
    * shard's serialized bitmap each batch (Update mode) — downstream
    * keeps the LAST emission per shard; merging is a bounded OR over
    * numShards bitmaps.
    */
  class BitmapProcessor
      extends StatefulProcessor[Long, Event, (Long, Array[Byte])] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("rbm",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Array[Byte])] = {
      val bm = if (state.exists()) BitmapCodec.deserialize(state.get())
        else new org.roaringbitmap.RoaringBitmap()
      rows.foreach { e =>
        require(e.user_id >= 0 && e.user_id <= Int.MaxValue,
          s"user_id ${e.user_id} outside the 32-bit bitmap key space")
        bm.add(e.user_id.toInt)
      }
      val bytes = BitmapCodec.serialize(bm)
      state.update(bytes)
      Iterator.single((key, bytes))
    }
  }

  /** Shard-and-fold entry point — [[HllStream.hllSketches]]'s sharding
    * discipline with exact set state.
    */
  def bitmapShards(events: Dataset[Event], numShards: Int = 8)
      : Dataset[(Long, Array[Byte])] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), numShards).toLong
    }.transformWithState(new BitmapProcessor,
      TimeMode.None(), OutputMode.Update(),
      Encoders.product[(Long, Array[Byte])])
  }

  /** OR-merge serialized shard bitmaps — exact, order-independent. */
  def merge(shards: Seq[Array[Byte]]): org.roaringbitmap.RoaringBitmap = {
    require(shards.nonEmpty, "no shard bitmaps to merge")
    val acc = new org.roaringbitmap.RoaringBitmap()
    shards.foreach(b => acc.or(BitmapCodec.deserialize(b)))
    acc
  }
}
