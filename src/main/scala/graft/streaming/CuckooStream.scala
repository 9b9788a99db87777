package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.LongType

/** CUCKOO-FILTER streaming membership (Fan–Andersen–Kaminsky–
  * Mitzenmacher CoNEXT'14) — the DELETABLE member of the sketch-state
  * family (qs01 Bloom membership, qs03 CMS frequency, qs08 KLL
  * distribution, qs11 HLL / qs12 bitmap cardinality): a Bloom filter
  * cannot unset bits, so the library's unbounded-dedup answer so far
  * was epoch ROTATION (EpochBloomDedupProcessor) — correct for
  * time-scoped dedup, useless for a mutable SET ("is this key
  * currently live?": active sessions, unexpired API keys, holdout
  * membership with opt-outs). The cuckoo filter stores a 16-bit
  * FINGERPRINT in one of two hash-linked buckets, so a delete removes
  * exactly one stored copy of the key's fingerprint and membership
  * reads stay O(2 buckets).
  *
  * Properties (the filter contract, gated by CuckooStreamSpec):
  *   - NO FALSE NEGATIVES on live keys: an inserted, not-deleted key
  *     is always reported present — the property deletes must not
  *     break, and the reason deletes are only legal for keys actually
  *     inserted (deleting a never-inserted key could evict a colliding
  *     fingerprint; the processor therefore makes delete a checked
  *     no-op when no fingerprint matches).
  *   - delete-then-readmit: after del(k), membership reads false
  *     (modulo the 2·s/2¹⁶ per-bucket-pair false-positive floor);
  *     a later add(k) re-admits it — the direction pair TTL/rotation
  *     cannot express.
  *   - bounded state: [[CuckooBuckets]]·[[CuckooSlots]]·2 bytes per
  *     shard FOREVER (the qs01 contract), ~0.95 load factor capacity.
  *
  * Determinism: fingerprints, bucket indexes, and the kick victim all
  * derive from xxhash64/the kick counter — replays and shard merges
  * are bit-stable, and the spec's assertions are exact.
  *
  * Scale shape: keys shard by `user_id % numShards` exactly like the
  * Bloom path — per-shard filters are independent byte arrays in
  * RocksDB ValueState, so capacity scales with shard count and the
  * per-batch work is the per-shard op fold.
  */
object CuckooStream {

  /** Power of two (the i2 = i1 XOR hash(fp) trick needs the modulus to
    * be a bitmask). 1024 buckets × 4 slots ≈ 3.9k keys/shard at the
    * 0.95 cuckoo load factor; 8 KiB state per shard.
    */
  val CuckooBuckets = 1024
  val CuckooSlots = 4
  val CuckooMaxKicks = 500

  /** Pure single-filter operations over the packed byte-array image
    * (2 bytes per slot, big-endian fingerprint; 0 = empty slot).
    */
  object Filter {
    def empty: Array[Byte] =
      new Array[Byte](CuckooBuckets * CuckooSlots * 2)

    private def hash(v: Long, seed: Long): Long =
      XxHash64Function.hash(v, LongType, seed)

    /** 16-bit fingerprint, never 0 (0 marks an empty slot). */
    def fpOf(key: Long): Int = {
      val fp = ((hash(key, 77L) >>> 48) & 0xFFFFL).toInt
      if (fp == 0) 1 else fp
    }
    def i1Of(key: Long): Int =
      (hash(key, 88L) & (CuckooBuckets - 1L)).toInt
    /** Partial-key cuckoo: the alternate bucket depends only on
      * (bucket, fingerprint), so eviction never needs the original key.
      */
    def altOf(i: Int, fp: Int): Int =
      i ^ (hash(fp.toLong, 99L) & (CuckooBuckets - 1L)).toInt

    private def slotGet(a: Array[Byte], bucket: Int, slot: Int): Int = {
      val p = (bucket * CuckooSlots + slot) * 2
      ((a(p) & 0xFF) << 8) | (a(p + 1) & 0xFF)
    }
    private def slotSet(a: Array[Byte], bucket: Int, slot: Int,
        fp: Int): Unit = {
      val p = (bucket * CuckooSlots + slot) * 2
      a(p) = ((fp >> 8) & 0xFF).toByte
      a(p + 1) = (fp & 0xFF).toByte
    }
    private def findSlot(a: Array[Byte], bucket: Int, fp: Int): Int = {
      var s = 0
      while (s < CuckooSlots) {
        if (slotGet(a, bucket, s) == fp) return s
        s += 1
      }
      -1
    }

    def contains(a: Array[Byte], key: Long): Boolean = {
      val fp = fpOf(key)
      val i1 = i1Of(key)
      findSlot(a, i1, fp) >= 0 || findSlot(a, altOf(i1, fp), fp) >= 0
    }

    /** Insert; returns false only when the kick chain exhausts
      * [[CuckooMaxKicks]] (filter effectively full). The kick victim
      * rotates deterministically with the kick counter.
      */
    def insert(a: Array[Byte], key: Long): Boolean = {
      var fp = fpOf(key)
      var i = i1Of(key)
      val i2 = altOf(i, fp)
      var s = findSlot(a, i, 0)
      if (s >= 0) { slotSet(a, i, s, fp); return true }
      s = findSlot(a, i2, 0)
      if (s >= 0) { slotSet(a, i2, s, fp); return true }
      i = i2 // start kicking from the alternate bucket
      var kicks = 0
      while (kicks < CuckooMaxKicks) {
        val victim = kicks % CuckooSlots
        val evicted = slotGet(a, i, victim)
        slotSet(a, i, victim, fp)
        fp = evicted
        i = altOf(i, fp)
        val free = findSlot(a, i, 0)
        if (free >= 0) { slotSet(a, i, free, fp); return true }
        kicks += 1
      }
      false
    }

    /** Remove ONE stored copy of the key's fingerprint; false (no-op)
      * when neither bucket holds it — deleting a never-inserted key
      * must not evict a colliding stranger.
      */
    def delete(a: Array[Byte], key: Long): Boolean = {
      val fp = fpOf(key)
      val i1 = i1Of(key)
      var s = findSlot(a, i1, fp)
      if (s >= 0) { slotSet(a, i1, s, 0); return true }
      val i2 = altOf(i1, fp)
      s = findSlot(a, i2, fp)
      if (s >= 0) { slotSet(a, i2, s, 0); return true }
      false
    }
  }

  /** Per-shard cuckoo filter; ops arrive as events with
    * `event_type` ∈ add | del | chk (anything else reads as chk) and
    * fold IN `event_id` ORDER within each (shard, batch) — the same
    * order a replay applies. Emits one row per op:
    * (event_id, user_id, op, member AFTER the op, op_applied).
    */
  class CuckooProcessor
      extends StatefulProcessor[Long, Event, (Long, Long, String, Boolean, Boolean)] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("cuckoo",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues)
        : Iterator[(Long, Long, String, Boolean, Boolean)] = {
      val a = if (state.exists()) state.get() else Filter.empty
      val out = rows.toSeq.sortBy(_.event_id).map { e =>
        val applied = e.event_type match {
          case "add" => Filter.insert(a, e.user_id)
          case "del" => Filter.delete(a, e.user_id)
          case _ => false
        }
        (e.event_id, e.user_id, e.event_type,
          Filter.contains(a, e.user_id), applied)
      }
      state.update(a)
      out.iterator
    }
  }

  /** Shard-and-filter entry point (the qs01 sharding discipline). */
  def cuckooMembership(ops: Dataset[Event], numShards: Int = 8)
      : Dataset[(Long, Long, String, Boolean, Boolean)] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(e => java.lang.Math.floorMod(e.user_id, numShards.toLong))
      .transformWithState(new CuckooProcessor,
        TimeMode.None(), OutputMode.Update(),
        Encoders.product[(Long, Long, String, Boolean, Boolean)])
  }
}
