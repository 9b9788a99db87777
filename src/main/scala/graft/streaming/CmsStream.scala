package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.util.sketch.CountMinSketch

/** Streaming Count-Min frequency sketching — the streaming twin of
  * q96's batch heavy hitters, and the canonical COUNTER-ADDITIVE
  * streaming state: each shard folds its substream into a fixed-size
  * CMS (depth·width longs, constant in distinct keys — the same
  * state-size contract as [[EventStreams.bloomDedup]], for counting
  * instead of membership), and because CMS cell updates are commutative
  * sums, the merge of all shard sketches is BIT-IDENTICAL to the
  * sketch a single batch pass over the same rows builds. That identity
  * (not a tolerance band) is what CmsStreamSpec pins against
  * `df.stat.countMinSketch` with the same (eps, confidence, seed).
  *
  * The reference's incremental refresh (cache.go:54-66) recomputes a
  * snapshot when upstream moves; a counter-additive sketch is the form
  * that never recomputes — new micro-batches fold in, estimates stay
  * queryable at every step.
  */
object CmsStream {

  /** q96's sketch parameters, shared so the twins are comparable. */
  val CmsEps = 0.001
  val CmsConfidence = 0.99
  val CmsSeed = 42

  /** Per-shard CMS fold over the `user_id` stream. Emits the shard's
    * serialized sketch each batch (Update mode) — downstream keeps the
    * LAST emission per shard; merging those is a bounded driver-side
    * fold (numShards sketches, not rows).
    */
  class CmsSketchProcessor(eps: Double, confidence: Double, seed: Int)
      extends StatefulProcessor[Long, Event, (Long, Array[Byte])] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("cms",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Array[Byte])] = {
      val cms = if (state.exists())
        CountMinSketch.readFrom(new ByteArrayInputStream(state.get()))
      else CountMinSketch.create(eps, confidence, seed)
      rows.foreach(e => cms.addLong(e.user_id))
      val bos = new ByteArrayOutputStream()
      cms.writeTo(bos)
      val bytes = bos.toByteArray
      state.update(bytes)
      Iterator.single((key, bytes))
    }
  }

  /** Shard-and-fold entry point: hash-shard events, fold each shard's
    * substream into its CMS. Same sharding discipline as
    * [[EventStreams.bloomDedup]] — state spreads across partitions
    * like any keyed state.
    */
  def cmsSketches(events: Dataset[Event], numShards: Int = 8,
      eps: Double = CmsEps, confidence: Double = CmsConfidence,
      seed: Int = CmsSeed): Dataset[(Long, Array[Byte])] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), numShards).toLong
    }.transformWithState(new CmsSketchProcessor(eps, confidence, seed),
      TimeMode.None(), OutputMode.Update(),
      Encoders.product[(Long, Array[Byte])])
  }

  /** Merge serialized shard sketches — counter-additive, so the result
    * equals the single-pass sketch over the union of the substreams.
    */
  def merge(shards: Seq[Array[Byte]]): CountMinSketch = {
    require(shards.nonEmpty, "no shard sketches to merge")
    shards.map(b => CountMinSketch.readFrom(new ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
  }
}
