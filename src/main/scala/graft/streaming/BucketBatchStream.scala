package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** STREAMING length-bucketed batching — the streaming twin of q581's
  * loader ledger ([[graft.llm.LengthBucketing]]): the shape a real
  * training loader actually runs — documents arrive as a stream, each
  * (bucket, shard) keeps ONE open batch, a batch closes the moment it
  * reaches its token-budget capacity, and the padding ledger accrues
  * batch by batch. State per shard is a |buckets|-bounded array map
  * (7 longs per bucket: closed ledger + the open batch), CONSTANT in
  * documents seen — the qs01/qs27 fixed-state contract.
  *
  * Determinism: batch composition depends on consumption order, so
  * the stream carries an explicit per-row SEQUENCE (the qs02 CDC
  * max-seq precedent — a loader consumes a sequenced feed, not
  * arrival luck) and the processor folds each call's rows in seq
  * order. Fed in q581's (md5, doc_id) order, the streamed ledger is
  * required IDENTICAL — every column, waste_ppm included — to the
  * batch ledger over the same docs (the qs03/qs23/qs27 bit-identity
  * convention, no tolerance): batches never cross shards in either
  * form, so closing each shard's tail batches and summing per bucket
  * reproduces the batch ledger exactly.
  */
object BucketBatchStream {

  /** Per-shard loader state: bucket → [nDocs, nBatchesClosed, real,
    * paddedClosed, openN, openMax, openSum].
    */
  final class LoaderState(val width: Int, val budget: Int) {
    val buckets = scala.collection.mutable.LongMap.empty[Array[Long]]

    def update(len: Long): Unit = {
      val b = len / width
      val cap = math.max(1L, budget.toLong / ((b + 1L) * width))
      val a = buckets.getOrElseUpdate(b, Array.fill(7)(0L))
      a(0) += 1L; a(2) += len
      a(4) += 1L; a(5) = math.max(a(5), len); a(6) += len
      if (a(4) == cap) {
        a(1) += 1L; a(3) += a(4) * a(5)
        a(4) = 0L; a(5) = 0L; a(6) = 0L
      }
    }

    /** Close the open tail batch of every bucket (end-of-stream) and
      * return the shard's final per-bucket ledger rows
      * (bucket, nDocs, nBatches, real, padded).
      */
    def finalRows: Seq[(Long, Long, Long, Long, Long)] =
      buckets.toSeq.sortBy(_._1).map { case (b, a) =>
        val nb = a(1) + (if (a(4) > 0L) 1L else 0L)
        val padded = a(3) + a(4) * a(5)
        (b, a(0), nb, a(2), padded)
      }.toSeq

    /** Canonical serialization (sorted bucket ids) — byte equality ⟺
      * state equality.
      */
    def serialized: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      val sorted = buckets.toSeq.sortBy(_._1)
      out.writeInt(width); out.writeInt(budget)
      out.writeInt(sorted.size)
      sorted.foreach { case (b, a) =>
        out.writeLong(b); a.foreach(out.writeLong)
      }
      out.flush(); bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): LoaderState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new LoaderState(in.readInt(), in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val b = in.readLong()
      st.buckets(b) = Array.fill(7)(in.readLong())
    }
    st
  }

  /** Per-shard fold over sequenced `(shard, seq, len)` rows. Emits
    * the shard's serialized state each batch (Update mode);
    * downstream keeps the LAST emission per shard.
    */
  class LoaderProcessor(width: Int, budget: Int)
      extends StatefulProcessor[Long, (Long, Long, Long), (Long, Array[Byte])] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("loader",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Array[Byte])] = {
      val st = if (state.exists()) deserialize(state.get())
        else new LoaderState(width, budget)
      rows.toSeq.sortBy(_._2).foreach(r => st.update(r._3))
      val bytes = st.serialized
      state.update(bytes)
      Iterator.single((key, bytes))
    }
  }

  /** Shard-keyed entry point over a sequenced `(shard, seq, len)`
    * doc stream.
    */
  def loaderStates(docs: Dataset[(Long, Long, Long)], width: Int,
      budget: Int): Dataset[(Long, Array[Byte])] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .transformWithState(new LoaderProcessor(width, budget),
        TimeMode.None(), OutputMode.Update(),
        Encoders.product[(Long, Array[Byte])])
  }

  /** Merge final shard states into the per-bucket corpus ledger
    * (bucket, n_docs, n_batches, real, padded) — batches never cross
    * shards, so this is pure addition after tail-closing each shard.
    */
  def mergedLedger(shards: Seq[Array[Byte]])
      : Seq[(Long, Long, Long, Long, Long)] =
    shards.flatMap(b => deserialize(b).finalRows)
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, rows) =>
        (b, rows.map(_._2).sum, rows.map(_._3).sum,
          rows.map(_._4).sum, rows.map(_._5).sum)
      }
}
