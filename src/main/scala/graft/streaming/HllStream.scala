package graft.streaming

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming HyperLogLog cardinality — the fourth leg of the
  * sketch-state family: membership ([[EventStreams.bloomDedup]], qs01),
  * frequency ([[CmsStream]], qs03), distribution ([[KllStream]], qs08),
  * and now CARDINALITY. Each shard folds its substream into a fixed
  * 2^lgK-register HLL (datasketches-java — the same library behind
  * Spark SQL's `hll_sketch_agg`, so batch q122/q170 and this stream
  * speak one serialized format). Both HLL representations are
  * ORDER-INDEPENDENT functions of the shard's value SET (coupon mode
  * keeps a hash set; dense mode keeps per-register maxima), so a
  * shard's streamed sketch equals the batch sketch over the same
  * values no matter how micro-batches sliced the stream — the
  * bit-level twin of CmsStream's counter-additivity, pinned in
  * HllStreamSpec. Register-max commutes across shards too, so the
  * union over shards loses nothing vs a single-pass build.
  *
  * State per shard is constant (≤ 2^lgK bytes for HLL_8 + header) in
  * stream length and distinct count — the streaming-dedup state
  * problem (unbounded key set) answered with a bounded estimator when
  * the question is "how many distinct", not "is this one a dup".
  */
object HllStream {

  /** lgK = 12 → 4096 registers, ~1.6% standard error — the accuracy
    * class warehouse `approx_count_distinct` defaults sit in.
    */
  val LgK = 12

  /** Per-shard HLL fold over the `user_id` stream. Emits the shard's
    * serialized updatable sketch each batch (Update mode) — downstream
    * keeps the LAST emission per shard; merging is a bounded
    * driver-side union (numShards sketches, not rows).
    */
  class HllSketchProcessor(lgK: Int)
      extends StatefulProcessor[Long, Event, (Long, Array[Byte])] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("hll",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Array[Byte])] = {
      val sk = if (state.exists()) HllSketch.heapify(state.get())
        else new HllSketch(lgK, TgtHllType.HLL_8)
      rows.foreach(e => sk.update(e.user_id))
      val bytes = sk.toUpdatableByteArray
      state.update(bytes)
      Iterator.single((key, bytes))
    }
  }

  /** Shard-and-fold entry point — the [[CmsStream.cmsSketches]]
    * sharding discipline, folding cardinality state instead of counts.
    */
  def hllSketches(events: Dataset[Event], numShards: Int = 8,
      lgK: Int = LgK): Dataset[(Long, Array[Byte])] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), numShards).toLong
    }.transformWithState(new HllSketchProcessor(lgK),
      TimeMode.None(), OutputMode.Update(),
      Encoders.product[(Long, Array[Byte])])
  }

  /** Union serialized shard sketches — register-max commutes, so the
    * result matches a single-pass build over the union of substreams.
    */
  def merge(shards: Seq[Array[Byte]], lgK: Int = LgK): HllSketch = {
    require(shards.nonEmpty, "no shard sketches to merge")
    val u = new Union(lgK)
    shards.foreach(b => u.update(HllSketch.heapify(b)))
    u.getResult(TgtHllType.HLL_8)
  }
}
