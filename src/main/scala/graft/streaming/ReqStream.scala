package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming RELATIVE-ERROR quantile sketch — the streaming twin of
  * q561's batch DDSketch-class log-bucket census
  * ([[graft.relational.ReqSketch]]), completing the streaming sketch-
  * state family on its quantile axis: KLL (qs08) holds UNIFORM rank
  * error, this holds error RELATIVE to the value — the p99.9-of-
  * latency shape — in a state that is a plain bucket→count map
  * (≤ 90 buckets per decade, constant in rows seen).
  *
  * Because the state is a COUNTER census (not a sampled compactor),
  * the shard merge is exact integer addition: the merged sketch is
  * BIT-IDENTICAL to the one-pass batch census over the same rows —
  * the qs03/qs23 counter-additivity contract, gated in-entry by qs27
  * and in ReqStreamSpec, with no tolerance band.
  *
  * Bucket ids pack the (digits, mantissa) pair of
  * [[graft.relational.ReqSketch]]'s decimal bucketing as
  * bid = digits·100 + mantissa (mantissa < 100, so bid order IS
  * numeric bucket order).
  */
object ReqStream {

  /** In-memory bucket census; serialized as (n, then bid/count pairs
    * sorted by bid — a canonical form, so byte equality ⟺ census
    * equality).
    */
  final class ReqState {
    val counts = scala.collection.mutable.LongMap.empty[Long]

    def update(cents: Long): Unit = if (cents >= 1L) {
      counts(ReqStream.bucketOf(cents)) =
        counts.getOrElse(ReqStream.bucketOf(cents), 0L) + 1L
    }

    def mergeFrom(other: ReqState): Unit =
      other.counts.foreach { case (bid, c) =>
        counts(bid) = counts.getOrElse(bid, 0L) + c
      }

    def serialized: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      val sorted = counts.toSeq.sortBy(_._1)
      out.writeInt(sorted.size)
      sorted.foreach { case (bid, c) =>
        out.writeLong(bid); out.writeLong(c)
      }
      out.flush(); bos.toByteArray
    }
  }

  /** Decimal log-bucket id of a positive cents value — EXACTLY the
    * q561 arithmetic (digits via decimal string length, mantissa via
    * positive floor division).
    */
  def bucketOf(v: Long): Long = {
    require(v >= 1L, s"bucketOf needs a positive value, got $v")
    val d10 = v.toString.length
    var p = 1L
    var i = 0
    while (i < d10 - 2) { p *= 10L; i += 1 }
    val m = v / p
    d10.toLong * 100L + m
  }

  /** Midpoint estimate of a bucket id — q561's m·p + p div 2. */
  def estimateOf(bid: Long): Long = {
    val d10 = (bid / 100L).toInt
    val m = bid % 100L
    var p = 1L
    var i = 0
    while (i < d10 - 2) { p *= 10L; i += 1 }
    m * p + p / 2L
  }

  def deserialize(bytes: Array[Byte]): ReqState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new ReqState
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val bid = in.readLong(); val c = in.readLong()
      st.counts(bid) = c
    }
    st
  }

  /** Sketch quantile probe: smallest bucket whose cumulative count
    * reaches rank k (1-based), as the bucket midpoint.
    */
  def quantileEstimate(st: ReqState, k: Long): Long = {
    var cum = 0L
    val hit = st.counts.toSeq.sortBy(_._1).find { case (_, c) =>
      cum += c; cum >= k
    }
    estimateOf(hit.getOrElse(throw new IllegalArgumentException(
      s"rank $k exceeds census total"))._1)
  }

  /** Per-shard census fold over the `value` stream (cents-quantized,
    * non-positive rows dropped — documented domain guard). Emits the
    * shard's serialized census each batch (Update mode); downstream
    * keeps the LAST emission per shard and merges by addition.
    */
  class ReqSketchProcessor
      extends StatefulProcessor[Long, Event, (Long, Array[Byte])] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("req",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[(Long, Array[Byte])] = {
      val st = if (state.exists()) deserialize(state.get())
        else new ReqState
      rows.foreach { e =>
        val cents = math.floor(100.0 * e.value).toLong
        if (cents >= 1L) st.update(cents)
      }
      val bytes = st.serialized
      state.update(bytes)
      Iterator.single((key, bytes))
    }
  }

  /** Shard-and-fold entry point — the qs01/qs03/qs08 sharding
    * discipline (hash-shard, fold per shard, merge the bounded shard
    * set downstream).
    */
  def reqSketches(events: Dataset[Event], numShards: Int = 8)
      : Dataset[(Long, Array[Byte])] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), numShards).toLong
    }.transformWithState(new ReqSketchProcessor,
      TimeMode.None(), OutputMode.Update(),
      Encoders.product[(Long, Array[Byte])])
  }

  /** Merge serialized shard censuses — exact counter addition. */
  def merge(shards: Seq[Array[Byte]]): ReqState = {
    require(shards.nonEmpty, "no shard censuses to merge")
    val acc = new ReqState
    shards.foreach(b => acc.mergeFrom(deserialize(b)))
    acc
  }
}
