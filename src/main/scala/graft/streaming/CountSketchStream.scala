package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.relational.CountSketch

/** Streaming COUNT-SKETCH — the signed member of the sketch-state
  * family (qs01 Bloom membership, qs03 CMS frequency, qs08 KLL
  * distribution, qs11 HLL cardinality, qs12 bitmap exact-distinct):
  * each shard folds its substream into a fixed Depth×Width cell array
  * (8·[[CountSketch.Depth]]·[[CountSketch.Width]] bytes of state,
  * constant in distinct keys), and because cell updates are
  * commutative integer sums, the elementwise SUM of shard arrays is
  * BIT-IDENTICAL to the one-pass batch sketch
  * ([[CountSketch.batchCells]]) over the same rows — the qs03
  * identity convention, pinned in CountSketchStreamSpec. Bucket and
  * sign come from the SAME xxhash64 chain the batch Column form uses
  * ([[CountSketch.bucketOf]]/[[CountSketch.signOf]]).
  */
object CountSketchStream {

  /** Per-shard count-sketch fold over the `user_id` stream. Emits the
    * shard's serialized cell array each batch (Update mode) —
    * downstream keeps the LAST emission per shard.
    */
  class CountSketchProcessor
      extends StatefulProcessor[Long, Event, (Long, Array[Byte])] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("csketch",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Array[Byte])] = {
      val cells =
        if (state.exists()) fromBytes(state.get())
        else new Array[Long](CountSketch.Depth * CountSketch.Width)
      rows.foreach { e =>
        var i = 0
        while (i < CountSketch.Depth) {
          cells(i * CountSketch.Width + CountSketch.bucketOf(i, e.user_id)) +=
            CountSketch.signOf(i, e.user_id)
          i += 1
        }
      }
      val bytes = toBytes(cells)
      state.update(bytes)
      Iterator.single((key, bytes))
    }
  }

  def toBytes(cells: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(cells.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    cells.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(b: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(b.length / 8)(bb.getLong())
  }

  /** Shard-and-fold entry point (the CmsStream discipline). */
  def sketches(events: Dataset[Event], numShards: Int = 8)
      : Dataset[(Long, Array[Byte])] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), numShards).toLong
    }.transformWithState(new CountSketchProcessor,
      TimeMode.None(), OutputMode.Update(),
      Encoders.product[(Long, Array[Byte])])
  }

  /** Elementwise sum of shard cell arrays — counter-additive, equals
    * the single-pass batch sketch over the union of substreams.
    */
  def merge(shards: Seq[Array[Byte]]): Array[Long] = {
    require(shards.nonEmpty, "no shard sketches to merge")
    shards.map(fromBytes).reduce { (a, b) =>
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }
}
