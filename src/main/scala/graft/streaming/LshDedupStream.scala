package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming MinHash-LSH NEAR-duplicate detection — the similarity
  * upgrade of qs01's exact Bloom dedup: qs01 drops byte-identical
  * re-sends, this flags documents whose minhash BAND collides with an
  * earlier document's (the q41 candidate rule, lifted into a stream).
  * The incremental-ingest question it answers is q243's ("is this new
  * crawl slice near-new?") with constant-latency state instead of a
  * batch re-join.
  *
  * Design for order-independence (the gate's hinge): per-bucket state
  * is the MIN owner doc_id seen so far — min is a semilattice, so the
  * final owner map is independent of micro-batch slicing AND of row
  * order inside a batch, and equals the batch groupBy-min exactly.
  * "doc is a near-dup" = some band bucket's final owner is a smaller
  * doc_id — the deterministic tie-order q41 itself uses (doc1 < doc2).
  *
  * The signature is computed as a STATELESS row projection (array_min
  * over a transform of the shingle array — no streaming aggregation
  * needed), spelled to produce bit-identical band hashes to the batch
  * pipeline's explode+groupBy+min: min over a multiset equals min over
  * the set, and xxhash64(j, shingle) matches term-for-term.
  *
  * State size: one long per OCCUPIED band bucket — bounded by bands ×
  * distinct-signature count, the same cardinality the batch banding
  * shuffle materializes; at 100 TB the TTL/epoch rotation discipline
  * of qs01 applies unchanged (drop buckets idle past the dedup
  * horizon).
  */
object LshDedupStream {

  val Perms = 16
  val Bands = 16

  /** Exactly [[graft.llm.DedupQueries]]'s shingle spelling, over a
    * pre-split `ws` column (inlining split(text) in the lambda
    * re-tokenizes per position — the q126 O(len²) trap, measured 2.8×
    * on q324).
    */
  private val shinglesExpr =
    """IF(size(ws) >= 3,
      |  transform(sequence(0, size(ws) - 3),
      |    i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])),
      |  array())""".stripMargin

  /** (doc_id, band, band_hash) rows from a (doc_id, text) frame via
    * stateless per-row expressions — usable on a static frame AND on a
    * stream (no aggregation). rowsPerBand = Perms / Bands.
    */
  def bandRows(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val rowsPerBand = Perms / Bands
    val sigExprs = (0 until Perms).map(j =>
      expr(s"array_min(transform(tgs, t -> xxhash64($j, t)))").as(s"h$j"))
    val bandCols = (0 until Bands).map { band =>
      val slice = (band * rowsPerBand until (band + 1) * rowsPerBand)
        .map(j => col(s"h$j"))
      xxhash64(slice: _*)
    }
    docs
      .withColumn("ws", split($"text", " "))
      .withColumn("tgs", expr(shinglesExpr))
      .filter(size($"tgs") > 0)
      .select($"doc_id" +: sigExprs: _*)
      .select($"doc_id", posexplode(array(bandCols: _*))
        .as(Seq("band", "band_hash")))
  }

  /** Per-bucket min-owner fold: emits the bucket's owner after each
    * batch (Update mode — the last emission per bucket is the final
    * min, since min only ever decreases).
    */
  class MinOwnerProcessor
      extends StatefulProcessor[(Int, Long), (Long, Int, Long), (Int, Long, Long)] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("owner",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long),
        rows: Iterator[(Long, Int, Long)],
        timerValues: TimerValues): Iterator[(Int, Long, Long)] = {
      var owner = if (state.exists()) state.get() else Long.MaxValue
      rows.foreach { case (docId, _, _) => if (docId < owner) owner = docId }
      state.update(owner)
      Iterator.single((key._1, key._2, owner))
    }
  }

  /** The streaming query: (doc_id, band, band_hash) rows → per-bucket
    * min owner via keyed state. Input rows are (doc_id, band,
    * band_hash) so the banding projection stays testable on the
    * static side of the seam.
    */
  def ownerStream(rows: Dataset[(Long, Int, Long)])
      : Dataset[(Int, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(r => (r._2, r._3))
      .transformWithState(new MinOwnerProcessor,
        TimeMode.None(), OutputMode.Update(),
        Encoders.product[(Int, Long, Long)])
  }

  /** Batch truth: final owner per bucket. */
  def batchOwners(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    bandRows(docs).groupBy($"band", $"band_hash")
      .agg(min($"doc_id").as("owner"))
  }

  /** Near-dup doc ids given final owners: any band bucket owned by a
    * smaller doc. */
  def nearDupDocs(docs: DataFrame, owners: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    bandRows(docs).join(owners, Seq("band", "band_hash"))
      .filter($"owner" < $"doc_id")
      .select($"doc_id").distinct()
  }
}
