package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** CDC update row for the qs02 bench (top-level: Spark's encoder codegen
  * cannot instantiate a case class nested inside an object). */
case class BenchCdcRow(k: Long, v: String, seq: Long)

/** Query-vector row for the qs21 beam-serve bench (top-level for the
  * same encoder reason). */
case class BenchServeQuery(qid: Long, qx: Long, qy: Long)

/** Bench-only harnesses for the streaming operators the driver's
  * batch-oriented gates never time: Bloom streaming dedup and the CDC
  * apply loop. Each entry runs a BOUNDED MemoryStream to completion —
  * deterministic input, a fixed micro-batch count, RocksDB state — and
  * returns a one-row frame of counts, so [[graft.Bench]]'s
  * `fn(spark, sfDir).count()` times the whole streaming run. These are
  * NOT oracle rows (their correctness lives in EventStreamsSpec /
  * CdcApplySpec); they exist so a state-management regression shows up
  * as a bench delta instead of passing silently.
  *
  * The driver-side `collect` here is the MemoryStream feeding contract
  * (data must originate on the driver) and is capped at [[BenchRows]]
  * rows — a harness bound, not an operator property; the operators
  * themselves read their input as a stream.
  */
object StreamBench {

  type Q = (SparkSession, String) => DataFrame

  /** Input cap — enough rows that per-row state work dominates the
    * fixed per-micro-batch overhead, small enough that the bench's
    * 1 warm-up + 3 timed reps stay a bounded slice of the round. */
  val BenchRows = 20000L
  val BloomBatches = 3
  val CdcBatches = 3
  /** CDC keyspace divisor: ~4 versions per key across the run. */
  val CdcVersions = 4

  private val runId = new AtomicLong()

  /** Scoped confs for a streaming bench run: RocksDB state (the
    * transformWithState requirement) and a state-partition count
    * matched to the shard count — state-store instances are created
    * per shuffle partition per micro-batch, so letting the bench's
    * local[32] default (32 partitions) stand would time 4× the store
    * open/commit overhead against 8 shards of actual state.
    */
  private def withStreamConfs[A](s: SparkSession)(body: => A): A = {
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      // changelog checkpointing: commit the per-batch delta instead of
      // a full RocksDB snapshot upload — the production setting for
      // frequent small batches, and without it the bench times snapshot
      // I/O instead of the dedup path
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true",
      "spark.sql.shuffle.partitions" -> "8")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private def boundedEvents(s: SparkSession, dir: String): Seq[Event] = {
    import s.implicits._
    T.events(s, dir)
      .select("event_id", "user_id", "event_type", "ts", "value")
      .filter(col("event_id") < BenchRows)
      .as[Event].collect().toSeq.sortBy(_.event_id)
  }

  /** qs01 — Bloom streaming dedup over [[BloomBatches]] micro-batches:
    * every batch boundary forces a state-store round-trip per shard, so
    * the timing tracks exactly the fixed-size-filter read/modify/write
    * path a state regression would inflate.
    */
  val qs01BloomDedupStream: Q = (s, dir) => {
    import s.implicits._
    withStreamConfs(s) {
      implicit val sqlCtx = s.sqlContext
      val rows = boundedEvents(s, dir)
      val stream = MemoryStream[Event]
      val name = s"bench_bloom_${runId.incrementAndGet()}"
      val q = EventStreams.bloomDedup(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("bench-bloom-ckpt").toString)
        .start()
      rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      q.stop(); q.awaitTermination()
      val out = s.table(name).count()
      s.catalog.dropTempView(name)
      Seq((rows.size.toLong, out)).toDF("n_in", "n_out")
    }
  }

  /** qs02 — CDC apply over [[CdcBatches]] micro-batches: each batch
    * folds last-writer-wins updates into the published snapshot and
    * atomically republishes, so the timing covers the whole
    * upsert → write → pointer-swap loop (the snapshot rewrite is the
    * dominant term, as in production).
    */
  val qs02CdcApplyStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    // keyspace scales with the ACTUAL input so ~CdcVersions versions
    // collapse per key at every scale factor
    val keySpace = math.max(1L, rows.size.toLong / CdcVersions)
    val updates = rows.map { e =>
      BenchCdcRow(e.event_id % keySpace, e.event_type, e.event_id)
    }
    val root = Files.createTempDirectory("bench-cdc-root").toString
    val ckpt = Files.createTempDirectory("bench-cdc-ckpt").toString
    val stream = MemoryStream[BenchCdcRow]
    val q = CdcApply.start(stream.toDF(), root, Seq("k"), "seq", ckpt)
    updates.grouped(updates.size / CdcBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val finalState = CdcApply.activeState(s, root, stream.toDF().schema)
    Seq((updates.size.toLong, finalState.count())).toDF("n_in", "n_keys")
  }

  /** qs03 — streaming Count-Min sketch over [[BloomBatches]]
    * micro-batches: per shard, the fixed-size counter fold in
    * ValueState — the counter-additive companion to qs01's membership
    * state. The final merge + a point estimate run after the stream
    * stops, so the timing is dominated by the per-batch
    * read/fold/write path.
    */
  val qs03CmsStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_cms_${runId.incrementAndGet()}"
    val q = CmsStream.cmsSketches(stream.toDS())
      .toDF("shard", "sketch")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-cms-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    // latest sketch per shard: update mode emits one row per (shard,
    // batch); CMS counters only grow, so per shard the cumulative
    // (= latest) sketch is the one with the max total. shards·batches
    // rows — driver-side pick is bounded.
    val all = s.table(name).select($"shard", $"sketch")
      .as[(Long, Array[Byte])].collect()
    val latest = all.groupBy(_._1).map { case (_, rows) =>
      rows.map(_._2).maxBy(b => CmsStream.merge(Seq(b)).totalCount())
    }.toSeq
    s.catalog.dropTempView(name)
    val merged = CmsStream.merge(latest)
    Seq((rows.size.toLong, merged.totalCount()))
      .toDF("n_in", "sketch_total")
  }

  /** qs04 — streaming z-score anomaly detection over [[BloomBatches]]
    * micro-batches: per-user fixed-size ring state, the integerized
    * 3σ test per row — times the read/ring-update/write path.
    */
  val qs04AnomalyStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
      .sortBy(e => (e.user_id, e.ts.getTime, e.event_id))
    val stream = MemoryStream[Event]
    val name = s"bench_anom_${runId.incrementAndGet()}"
    val q = AnomalyStream.zScoreAnomalies(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-anom-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val out = s.table(name).count()
    s.catalog.dropTempView(name)
    Seq((rows.size.toLong, out)).toDF("n_in", "n_anomalies")
  }

  /** qs10 — streaming per-group top-k over [[BloomBatches]]
    * micro-batches: O(k) merge per key per batch (the stateful twin of
    * the TopKPerGroup custom plan) — times the summary-merge state
    * path.
    */
  val qs10TopKStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir).sortBy(_.event_id)
    val stream = MemoryStream[Event]
    val name = s"bench_topk_${runId.incrementAndGet()}"
    val q = TopKStream.topKPerUser(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-topk-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val out = s.table(name).count()
    s.catalog.dropTempView(name)
    Seq((rows.size.toLong, out)).toDF("n_in", "n_emitted")
  }

  /** qs05 — streaming as-of join over [[BloomBatches]] micro-batches:
    * purchases probe the per-user signup series. The heaviest stateful
    * processor in the library (two buffered sides + event-time timers
    * per key); this entry times the buffer/match/expire path that the
    * batch gates never touch. Sentinels on BOTH sides push the final
    * watermark so every pending probe resolves inside the timed run.
    */
  val qs05AsOfStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val purchases = rows.filter(_.event_type == "purchase")
    val signups = rows.filter(e =>
      e.event_type == "signup" || e.event_type == "view")
    val maxTs = rows.map(_.ts.getTime).max
    val pS = MemoryStream[Event]
    val sS = MemoryStream[Event]
    val name = s"bench_asof_${runId.incrementAndGet()}"
    val q = EventStreams.streamingAsOf(pS.toDF(), sS.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-asof-ckpt").toString)
      .start()
    val pChunks = purchases.grouped(purchases.size / BloomBatches + 1).toSeq
    val sChunks = signups.grouped(signups.size / BloomBatches + 1).toSeq
    pChunks.zipAll(sChunks, Seq.empty[Event], Seq.empty[Event]).foreach {
      case (p, sg) =>
        if (p.nonEmpty) pS.addData(p)
        if (sg.nonEmpty) sS.addData(sg)
        q.processAllAvailable()
    }
    val sentinel = Event(-1L, -1L, "sentinel",
      new java.sql.Timestamp(maxTs + 24L * 3600 * 1000), 0.0)
    pS.addData(sentinel); sS.addData(sentinel)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val out = s.table(name).filter($"user_id" =!= -1L).count()
    s.catalog.dropTempView(name)
    Seq((purchases.size.toLong, out)).toDF("n_probes", "n_matched")
  }

  /** qs06 — streaming conversion funnel over [[BloomBatches]]
    * micro-batches: per-user staged state with an expiry horizon — the
    * second-heaviest stateful processor, timing the stage-advance +
    * timer-expiry path.
    */
  val qs06FunnelStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val maxTs = rows.map(_.ts.getTime).max
    val stream = MemoryStream[Event]
    val name = s"bench_funnel_${runId.incrementAndGet()}"
    val q = EventStreams.streamingFunnel(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-funnel-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    // signup-typed sentinel: it must SURVIVE the funnel's event-type
    // filter (which runs before the watermark operator) to advance the
    // watermark past every real row
    stream.addData(Event(-1L, -1L, "signup",
      new java.sql.Timestamp(maxTs + 24L * 3600 * 1000), 0.0))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val out = s.table(name).filter($"user_id" =!= -1L).count()
    s.catalog.dropTempView(name)
    Seq((rows.size.toLong, out)).toDF("n_in", "n_users")
  }

  /** qs07 — CHAINED stateful operators (dedup → tumbling agg) in one
    * query: every micro-batch commits TWO stacked state stores on one
    * watermark timeline — the multi-stateful-pipeline path whose
    * overhead is invisible when each operator is benched alone.
    */
  val qs07ChainedStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val maxTs = rows.map(_.ts.getTime).max
    val stream = MemoryStream[Event]
    val name = s"bench_chain_${runId.incrementAndGet()}"
    val q = EventStreams.dedupedTumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-chain-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    stream.addData(Event(-1L, -1L, "sentinel",
      new java.sql.Timestamp(maxTs + 24L * 3600 * 1000), 0.0))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val out = s.table(name).filter($"event_type" =!= "sentinel").count()
    s.catalog.dropTempView(name)
    Seq((rows.size.toLong, out)).toDF("n_in", "n_windows")
  }

  /** Bench-only entries — timed by [[graft.Bench]], absent from
    * [[graft.SparkEntry.queries]] so the correctness gate (which has no
    * streaming-SQL oracle) is unaffected.
    */
  /** qs08 — streaming KLL quantiles over [[BloomBatches]] micro-batches:
    * per shard, the O(k·log n) distribution-state fold in ValueState —
    * completing the sketch-state trio (qs01 membership, qs03
    * frequency). The final merge + decile read run after the stream
    * stops; the timing is the per-batch read/fold/write path.
    */
  val qs08KllStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_kll_${runId.incrementAndGet()}"
    val q = KllStream.kllSketches(stream.toDS())
      .toDF("shard", "sketch")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-kll-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    // latest sketch per shard = the one with the largest folded count
    // (n only grows); shards·batches rows — driver-side pick is bounded
    val all = s.table(name).select($"shard", $"sketch")
      .as[(Long, Array[Byte])].collect()
    val latest = all.groupBy(_._1).map { case (_, rs) =>
      rs.map(_._2).maxBy(b => graft.functions.KllState.deserialize(b).n)
    }.toSeq
    s.catalog.dropTempView(name)
    val merged = KllStream.merge(latest)
    val deciles = merged.quantiles(10)
    Seq((rows.size.toLong, merged.n, deciles(5)))
      .toDF("n_in", "sketch_n", "p50")
  }

  /** qs09 — full-outer stream-stream interval join over
    * [[BloomBatches]] micro-batches: times the two-sided join-state
    * buffer plus BOTH watermark-gated outer-emission paths (the state
    * machinery qs05's as-of processor does by hand, exercised here
    * through Spark's native stream-stream join). Sentinels on both
    * sides close every window inside the timed run.
    */
  val qs09FullOuterJoinStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val purchases = rows.filter(_.event_type == "purchase")
    val signups = rows.filter(_.event_type == "signup")
    val maxTs = rows.map(_.ts.getTime).max
    val pS = MemoryStream[Event]
    val sS = MemoryStream[Event]
    val name = s"bench_fullouter_${runId.incrementAndGet()}"
    val q = EventStreams.attributionLedger(pS.toDF(), sS.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-fullouter-ckpt").toString)
      .start()
    val pChunks = purchases.grouped(purchases.size / BloomBatches + 1).toSeq
    val sChunks = signups.grouped(signups.size / BloomBatches + 1).toSeq
    pChunks.zipAll(sChunks, Seq.empty[Event], Seq.empty[Event]).foreach {
      case (p, sg) =>
        if (p.nonEmpty) pS.addData(p)
        if (sg.nonEmpty) sS.addData(sg)
        q.processAllAvailable()
    }
    val sentinel = Event(-1L, -1L, "sentinel",
      new java.sql.Timestamp(maxTs + 24L * 3600 * 1000), 0.0)
    pS.addData(sentinel); sS.addData(sentinel)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val out = s.table(name).filter($"user_id" =!= -1L)
    val matched = out.filter($"purchase_id".isNotNull && $"signup_id".isNotNull).count()
    val orphans = out.filter($"purchase_id".isNull || $"signup_id".isNull).count()
    s.catalog.dropTempView(name)
    Seq((matched, orphans)).toDF("n_matched", "n_orphans")
  }

  /** qs11 — streaming HLL cardinality over [[BloomBatches]]
    * micro-batches: per shard, the constant-size register fold in
    * ValueState — completing the sketch-state quartet (qs01
    * membership, qs03 frequency, qs08 distribution, cardinality
    * here). The timing is the per-batch heapify/update/serialize
    * path; the merge runs after the stream stops.
    */
  val qs11HllStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_hll_${runId.incrementAndGet()}"
    val q = HllStream.hllSketches(stream.toDS())
      .toDF("shard", "sketch")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-hll-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    // latest sketch per shard: HLL estimates only grow within a shard
    // (register maxima are monotone), so the max-estimate emission is
    // the cumulative one. shards·batches rows — bounded driver pick.
    val all = s.table(name).select($"shard", $"sketch")
      .as[(Long, Array[Byte])].collect()
    val latest = all.groupBy(_._1).map { case (_, rs) =>
      rs.map(_._2).maxBy(b =>
        org.apache.datasketches.hll.HllSketch.heapify(b).getEstimate)
    }.toSeq
    s.catalog.dropTempView(name)
    val merged = HllStream.merge(latest)
    Seq((rows.size.toLong, math.round(merged.getEstimate)))
      .toDF("n_in", "est_distinct")
  }

  /** qs12 — streaming EXACT distinct via Roaring bitmap state
    * ([[BitmapStream]]): the exact complement of qs11 on the same
    * shard-and-fold path; the timing is the per-batch
    * deserialize/OR/serialize of compressed set state, and the
    * post-stream merge must equal the exact distinct count (asserted —
    * a bench entry that also cannot silently go wrong).
    */
  val qs12BitmapStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_rbm_${runId.incrementAndGet()}"
    val q = BitmapStream.bitmapShards(stream.toDS())
      .toDF("shard", "bm")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-rbm-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val all = s.table(name).select($"shard", $"bm")
      .as[(Long, Array[Byte])].collect()
    // bitmaps only grow within a shard: max cardinality = cumulative
    val latest = all.groupBy(_._1).map { case (_, rs) =>
      rs.map(_._2).maxBy(b =>
        graft.functions.BitmapCodec.deserialize(b).getLongCardinality)
    }.toSeq
    s.catalog.dropTempView(name)
    val merged = BitmapStream.merge(latest)
    val exact = rows.map(_.user_id).distinct.size.toLong
    require(merged.getLongCardinality == exact,
      s"streamed bitmap distinct ${merged.getLongCardinality} != $exact")
    Seq((rows.size.toLong, merged.getLongCardinality))
      .toDF("n_in", "n_distinct")
  }

  /** qs13 — streaming deterministic k-sample via bottom-k state
    * ([[ReservoirStream]]): the sample leg of the sketch-state family;
    * timing tracks the constant-k state read/fold/write per shard per
    * batch, and the post-stream merge must equal the batch bottom-k
    * EXACTLY (asserted id-for-id — the semilattice makes the gate
    * exact where the sketch legs can only bound).
    */
  val qs13ReservoirStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_rsv_${runId.incrementAndGet()}"
    val q = ReservoirStream.reservoirShards(stream.toDS())
      .toDF("shard", "sample")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-rsv-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val all = s.table(name).select($"shard", $"sample")
      .as[(Long, Array[Byte])].collect()
    s.catalog.dropTempView(name)
    // every emission holds true observed (priority, id) pairs, and
    // bottom-k over the union of bottom-ks IS the global bottom-k
    // (semilattice) — so merging ALL emissions needs no latest-state
    // bookkeeping and is exactly right
    val streamed = ReservoirStream.merge(all.map(_._2))
    val batch = rows.map(_.event_id).distinct
      .sortBy(id => (graft.functions.ReservoirSample.priority(id), id))
      .take(ReservoirStream.K)
    require(streamed == batch,
      s"streamed sample != batch bottom-k (${streamed.size}/${batch.size})")
    Seq((rows.size.toLong, streamed.size.toLong)).toDF("n_in", "k")
  }

  /** qs14 — watermarked SESSION WINDOWS over [[BloomBatches]]
    * micro-batches plus a far-future sentinel that flushes every open
    * session: times the merging-session state path (session_window is
    * the one windowing mode whose state MERGES adjacent entries rather
    * than folding into a fixed key), and gates the emitted session set
    * against the same rows' batch session_window — count-exact.
    */
  val qs14SessionStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
      .sortBy(e => (e.ts.getTime, e.event_id))
    val maxTs = rows.map(_.ts.getTime).max
    val stream = MemoryStream[Event]
    val name = s"bench_sess_${runId.incrementAndGet()}"
    val q = EventStreams.sessionCounts(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-sess-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    stream.addData(Event(-1L, -1L, "sentinel",
      new java.sql.Timestamp(maxTs + 24L * 3600 * 1000), 0.0))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val streamed = s.table(name).filter($"user_id" =!= -1L).count()
    s.catalog.dropTempView(name)
    val batch = rows.toDF()
      .groupBy($"user_id", session_window($"ts", "10 minutes"))
      .count().count()
    require(streamed == batch,
      s"session stream/batch mismatch: $streamed vs $batch")
    Seq((rows.size.toLong, streamed)).toDF("n_in", "n_sessions")
  }

  /** qs15 — streaming MinHash-LSH NEAR-dup detection
    * ([[LshDedupStream]]): per-band-bucket min-owner state over
    * [[BloomBatches]] micro-batches; the gate replays the batch
    * groupBy-min over the same docs and requires bucket-for-bucket
    * equality (min is a semilattice — slicing-independent), then
    * counts flagged near-dups. Times the keyed-state fold on the
    * banding key space, the similarity sibling of qs01's exact path.
    */
  val qs15LshDedupStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // harness bound (the BenchRows convention): 1000 docs × 16 bands
    // ≈ 16k state keys — enough that per-key state work dominates,
    // small enough that the 2-run bench stays a bounded slice
    val docs = T.documents(s, dir).select($"doc_id", $"text")
      .filter($"doc_id" < 1000L)
      .localCheckpoint()
    val rows = LshDedupStream.bandRows(docs)
      .as[(Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val stream = MemoryStream[(Long, Int, Long)]
    val name = s"bench_lsh_${runId.incrementAndGet()}"
    val q = LshDedupStream.ownerStream(stream.toDS())
      .toDF("band", "band_hash", "owner")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-lsh-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    // min only decreases -> the per-bucket MIN over all emissions is
    // the final owner (no last-batch bookkeeping needed)
    val streamed = s.table(name)
      .groupBy($"band", $"band_hash").agg(min($"owner").as("owner"))
      .localCheckpoint()
    s.catalog.dropTempView(name)
    val batch = LshDedupStream.batchOwners(docs)
    val diff = streamed.join(batch.withColumnRenamed("owner", "b_owner"),
        Seq("band", "band_hash"), "full_outer")
      .filter($"owner".isNull || $"b_owner".isNull || $"owner" =!= $"b_owner")
      .count()
    require(diff == 0L, s"streamed owners diverge from batch: $diff buckets")
    val dups = LshDedupStream.nearDupDocs(docs, streamed).count()
    Seq((docs.count(), dups)).toDF("n_docs", "n_near_dups")
  }

  /** qs16 — streaming PSI drift monitor ([[PsiStream]]): the
    * observation window's first half is the FIXED reference histogram,
    * the second half streams in over [[BloomBatches]] micro-batches,
    * and each batch re-emits per-type PSI. The gate replays the same
    * split batch-side through the ONE shared finish
    * ([[PsiStream.psiMicro]]) and requires type-for-type equality of
    * (n_rows, n_bins, psi_micro) — counter-additive histogram state
    * makes that exact, not a tolerance band. Times the per-batch
    * map-state fold + bounded-bin finish path.
    */
  val qs16PsiStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val mid = {
      val ts = rows.map(_.ts.getTime)
      ts.min + (ts.max - ts.min) / 2
    }
    val (refRows, curRows) = rows.partition(_.ts.getTime < mid)
    val ref = refRows.groupBy(_.event_type).map { case (t, es) =>
      t -> es.groupBy(e => PsiStream.binOf(e.value))
        .map { case (b, bs) => b -> bs.size.toLong }
    }
    val stream = MemoryStream[Event]
    val name = s"bench_psi_${runId.incrementAndGet()}"
    val q = PsiStream.psiStream(stream.toDS(), ref)
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-psi-ckpt").toString)
      .start()
    curRows.grouped(curRows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    // latest emission per type = the max-n_rows one (n_rows is the
    // monotone cumulative fold count); types × batches rows — bounded
    val all = s.table(name).as[PsiEmit].collect()
    s.catalog.dropTempView(name)
    val streamed = all.groupBy(_.event_type).map { case (t, es) =>
      t -> es.maxBy(_.n_rows)
    }
    val curBatch = curRows.groupBy(_.event_type).map { case (t, es) =>
      t -> es.groupBy(e => PsiStream.binOf(e.value))
        .map { case (b, bs) => b -> bs.size.toLong }
    }
    (ref.keySet ++ curBatch.keySet).foreach { t =>
      val nCur = curBatch.getOrElse(t, Map.empty).values.sum
      if (nCur == 0L)
        require(!streamed.contains(t),
          s"type $t emitted a reading with no current-window rows")
      else {
        val e = streamed(t)
        val exp = PsiStream.psiMicro(ref.getOrElse(t, Map.empty),
          curBatch.getOrElse(t, Map.empty))
        require(e.n_rows == nCur && (e.n_bins, e.psi_micro) == exp,
          s"type $t: streamed (${e.n_rows},${e.n_bins},${e.psi_micro}) " +
            s"!= batch ($nCur,${exp._1},${exp._2})")
      }
    }
    val drifted = streamed.values.count(_.psi_micro > 250000L).toLong
    Seq((streamed.size.toLong, drifted)).toDF("n_types", "n_drifted")
  }

  /** qs17 — streaming CUSUM alarm monitor ([[CusumStream]]): the
    * drift family's ALERT leg (qs16 reads PSI, this one pages). The
    * reference mean comes from the observation window's first half as
    * an exact rational; the second half streams in TIME ORDER over
    * [[BloomBatches]] micro-batches (the ordered-topic contract CUSUM
    * needs). The gate replays the identical fold batch-side through
    * the ONE shared step ([[CusumStream.step]]) and requires
    * type-for-type equality of the full final state — integer-exact,
    * no tolerance. Times the per-batch sort + 5-long ValueState fold.
    */
  val qs17CusumStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val mid = {
      val ts = rows.map(_.ts.getTime)
      ts.min + (ts.max - ts.min) / 2
    }
    val (refRows, curRows0) = rows.partition(_.ts.getTime < mid)
    val refs = refRows.groupBy(_.event_type).map { case (t, es) =>
      t -> CusumRef(es.map(e => CusumStream.cents(e.value)).sum,
        es.size.toLong)
    }
    val curRows = curRows0.sortBy(e => (e.ts.getTime, e.event_id))
    val stream = MemoryStream[Event]
    val name = s"bench_cusum_${runId.incrementAndGet()}"
    val q = CusumStream.cusumStream(stream.toDS(), refs)
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-cusum-ckpt").toString)
      .start()
    curRows.grouped(curRows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val all = s.table(name).as[CusumEmit].collect()
    s.catalog.dropTempView(name)
    val streamed = all.groupBy(_.event_type).map { case (t, es) =>
      t -> es.maxBy(_.n_rows)
    }
    curRows.groupBy(_.event_type).foreach { case (t, es0) =>
      val es = es0.sortBy(e => (e.ts.getTime, e.event_id))
      val exp = CusumStream.fold(es, refs(t))
      val e = streamed(t)
      require((e.n_rows, e.s_pos, e.s_neg, e.n_alarms, e.first_alarm_n) ==
        ((exp.n, exp.sPos, exp.sNeg, exp.nAlarms, exp.firstAlarmN)),
        s"type $t: streamed $e != batch $exp")
    }
    Seq((streamed.size.toLong, streamed.values.map(_.n_alarms).sum))
      .toDF("n_types", "n_alarms_total")
  }

  /** qs18 — streaming EWMA control chart ([[EwmaStream]]): qs17's
    * reference-window/gate harness with the EWMA processor — the
    * geometric-discount half of the monitoring pair (q369's scaladoc
    * contract). Gate: full-final-state equality (EWMA micro, counters)
    * vs the shared-step batch fold.
    */
  val qs18EwmaStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val mid = {
      val ts = rows.map(_.ts.getTime)
      ts.min + (ts.max - ts.min) / 2
    }
    val (refRows, curRows0) = rows.partition(_.ts.getTime < mid)
    val refs = refRows.groupBy(_.event_type).map { case (t, es) =>
      val cs = es.map(e => CusumStream.cents(e.value))
      t -> EwmaStream.refOf(cs.size.toLong, cs.sum,
        cs.map(c => c * c).sum)
    }
    val curRows = curRows0.sortBy(e => (e.ts.getTime, e.event_id))
    val stream = MemoryStream[Event]
    val name = s"bench_ewma_${runId.incrementAndGet()}"
    val q = EwmaStream.ewmaStream(stream.toDS(), refs)
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-ewma-ckpt").toString)
      .start()
    curRows.grouped(curRows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val all = s.table(name).as[EwmaEmit].collect()
    s.catalog.dropTempView(name)
    val streamed = all.groupBy(_.event_type).map { case (t, es) =>
      t -> es.maxBy(_.n_rows)
    }
    curRows.groupBy(_.event_type).foreach { case (t, es0) =>
      val es = es0.sortBy(e => (e.ts.getTime, e.event_id))
      val exp = EwmaStream.fold(es, refs(t))
      val e = streamed(t)
      require((e.n_rows, e.ewma_micro, e.n_alarms, e.first_alarm_n) ==
        ((exp.n, math.floor(1000000.0 * exp.e).toLong, exp.nAlarms,
          exp.firstAlarmN)),
        s"type $t: streamed $e != batch $exp")
    }
    Seq((streamed.size.toLong, streamed.values.map(_.n_alarms).sum))
      .toDF("n_types", "n_alarms_total")
  }

  /** qs19 — streaming SLIDING-WINDOW DISTINCT ([[SlidingHllStream]]):
    * the watermark/timer leg of the sketch-state family — per-(shard,
    * day) HLL MapState, event-time timers finalize each day's
    * trailing-[[SlidingHllStream.WindowDays]]-day union once the
    * watermark passes, eviction retires days no window can read. Rows
    * stream in time order over [[BloomBatches]] micro-batches plus the
    * empty batches that let the final watermark fire the tail timers.
    * Gate: finalized per-day estimates EXACTLY equal the batch twin
    * through the same (shard, day) atoms ([[SlidingHllStream
    * .batchEstimates]]) on every finalized day — the q406 sketch-merge
    * answer, streamed. Times the fold + timer + eviction path.
    */
  val qs19SlidingHllStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir).sortBy(e => (e.ts.getTime, e.event_id))
    val stream = MemoryStream[Event]
    val name = s"bench_slhll_${runId.incrementAndGet()}"
    val q = SlidingHllStream.slidingSketches(stream.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-slhll-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    (1 to 2).foreach { _ =>
      stream.addData(Seq.empty[Event]); q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val emits = s.table(name).as[SlidingHllEmit].collect().toSeq
    s.catalog.dropTempView(name)
    val got = SlidingHllStream.mergeEstimates(emits)
    val twin = SlidingHllStream.batchEstimates(rows)
    val wmFinal = rows.map(_.ts.getTime).max -
      SlidingHllStream.LatenessDays * SlidingHllStream.DayMillis
    val finalDays = twin.keySet
      .filter(d => (d + 1) * SlidingHllStream.DayMillis <= wmFinal)
    require(got.keySet == finalDays,
      s"emitted ${got.keySet.size} days != finalized ${finalDays.size}")
    finalDays.foreach { d =>
      if (got(d) != twin(d)) {
        emits.filter(_.day == d).sortBy(_.shard).foreach { e =>
          System.err.println(s"[qs19dbg] shard=${e.shard} day=$d " +
            s"merged=${e.n_days_merged} est=" +
            org.apache.datasketches.hll.HllSketch
              .heapify(e.window_sketch).getEstimate)
        }
      }
      require(got(d) == twin(d), s"day $d: ${got(d)} != twin ${twin(d)}")
    }
    Seq((finalDays.size.toLong,
      got.values.map(v => math.floor(v).toLong).sum))
      .toDF("n_days_finalized", "sum_floor_estimates")
  }

  /** qs20 — STREAM-STATIC broadcast enrichment join + stateful agg:
    * the bread-and-butter streaming-ETL shape the qs suite lacked —
    * every micro-batch equi-joins the event stream against the STATIC
    * customer dimension (re-resolved per batch by the engine; no
    * state for the join itself, the 100 TB pattern for dimension
    * enrichment), then folds a per-segment revenue aggregate in
    * complete mode. Gate: the final per-segment (n, cents) table
    * EXACTLY equals the batch join+agg over the same rows — integer
    * cents, so equality is exact.
    */
  val qs20StreamStaticJoin: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val dim = T.customer(s, dir)
      .select($"c_custkey".as("ckey"), $"c_mktsegment")
    val nCust = dim.count()
    val stream = MemoryStream[Event]
    val name = s"bench_ssj_${runId.incrementAndGet()}"
    val q = stream.toDS()
      .withColumn("ckey", pmod($"user_id", lit(nCust)))
      .withColumn("cents",
        expr("CAST(FLOOR(100 * value) AS BIGINT)"))
      .join(dim, "ckey") // stream-static: dimension re-read per batch
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-ssj-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val streamed = s.table(name)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    s.catalog.dropTempView(name)
    val batch = s.createDataset(rows).toDF()
      .withColumn("ckey", pmod($"user_id", lit(nCust)))
      .withColumn("cents", expr("CAST(FLOOR(100 * value) AS BIGINT)"))
      .join(dim, "ckey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    require(streamed == batch,
      s"stream-static join diverges: ${streamed.size} vs ${batch.size} segments")
    Seq((streamed.size.toLong, streamed.values.map(_._1).sum))
      .toDF("n_segments", "n_rows_joined")
  }

  /** qs21 — STREAMING BEAM-SERVE probe: the q456 graph-ANN walk as a
    * micro-batch query service — static persisted serving index
    * (pts + degree-capped graph, built once via IndexStore), a
    * MemoryStream of query vectors drained in [[BloomBatches]]
    * batches, and per batch a foreachBatch hop loop (the q456 walk
    * verbatim: hash-spread entries, beam [[graft.operators.GraphServe.Beam]],
    * [[graft.operators.GraphServe.Hops]] hops) — so the bench times
    * the SERVING path's per-batch latency the way qs01-qs20 time the
    * other stateful legs. Gate: the streamed answers EXACTLY equal
    * the one-shot batch walk over the same query set (per-query
    * walks are independent and tie-broken deterministically, so
    * slicing must not change a single answer).
    */
  val qs21BeamServeStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.GraphServe
    val (pts, graph, _) = GraphServe.servingGraph(s, dir)
    val allQueries = GraphServe.serveQueries(pts)
    val qRows = allQueries.as[BenchServeQuery].collect().toSeq.sortBy(_.qid)
    val entries = pts.select($"vec_id".as("node"))
      .orderBy(xxhash64($"node"), $"node").limit(GraphServe.Entries)
      .localCheckpoint()
    def serve(queries: DataFrame): Map[Long, Long] = {
      val beam0 = graft.plans.TopK.perGroup(
        GraphServe.withDist(pts, queries)(
          queries.select($"qid").crossJoin(broadcast(entries))),
        Seq("qid"), Seq("d2" -> true, "node" -> true), GraphServe.Beam)
      GraphServe.beamAnswer(GraphServe.walk(pts, queries, graph, beam0,
        GraphServe.Beam, GraphServe.Hops))
        .as[(Long, Long)].collect().toMap
    }
    val streamed = scala.collection.mutable.Map[Long, Long]()
    val stream = MemoryStream[BenchServeQuery]
    val q = stream.toDF()
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("bench-serve-ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) streamed ++= serve(batch.localCheckpoint())
        ()
      }
      .start()
    qRows.grouped(qRows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val oneShot = serve(allQueries)
    require(streamed.toMap == oneShot,
      s"streamed serve diverges: ${streamed.size} vs ${oneShot.size} answers")
    Seq((oneShot.size.toLong, BloomBatches.toLong))
      .toDF("n_queries", "n_batches")
  }

  /** qs22 — STREAMING INDEX MAINTENANCE: q477's HNSW-style insert run
    * as a micro-batch pipeline — the index stays SERVABLE while new
    * vectors land. The 10% delta split arrives as a MemoryStream in
    * [[BloomBatches]] batches; each batch walks the CURRENT (evolving)
    * graph via foreachBatch (so later inserts can link to earlier
    * ones — the realism the one-shot q477 lacks), links both
    * directions, and re-caps to M nearest; rounds are checkpointed
    * with measured stats. Gate: full-corpus exact-truth recall of the
    * q456 query set over the FINAL graph ≥ the q477 floor, and every
    * streamed delta node must be wired into the final edge set.
    */
  /** qs23 — streaming COUNT-SKETCH over [[BloomBatches]] micro-batches
    * (the signed sibling of qs03): per-shard Depth×Width cell fold,
    * final merged cells required BIT-IDENTICAL to the batch one-pass
    * sketch over the same rows — the identity is gated in-entry.
    */
  val qs23CountSketchStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_csketch_${runId.incrementAndGet()}"
    val q = CountSketchStream.sketches(stream.toDS())
      .toDF("shard", "cells")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-csketch-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val emissions = s.table(name).select($"shard", $"cells")
      .as[(Long, Array[Byte])].collect()
    s.catalog.dropTempView(name)
    val last = emissions.zipWithIndex
      .groupBy(_._1._1).map { case (_, es) => es.maxBy(_._2)._1._2 }.toSeq
    val merged = CountSketchStream.merge(last)
    val batch = graft.relational.CountSketch.denseCells(
      graft.relational.CountSketch.batchCells(
        rows.map(_.user_id).toDF("k")).as[(Long, Long, Long)]
        .collect().toSeq)
    require(merged.sameElements(batch),
      "qs23: streamed-merged cells differ from the batch sketch")
    Seq((rows.size.toLong, merged.count(_ != 0L).toLong))
      .toDF("n_in", "nonzero_cells")
  }

  val qs22GraphInsertStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.{Dbscan, GraphInsert, GraphServe}
    val pts = graft.core.Tables.embeddings(s, dir)
      .select($"vec_id",
        expr(s"CAST(FLOOR(${Dbscan.DbScale} * embedding[0]) AS BIGINT)")
          .as("x"),
        expr(s"CAST(FLOOR(${Dbscan.DbScale} * embedding[1]) AS BIGINT)")
          .as("y"))
      .localCheckpoint()
    val isDelta =
      pmod(xxhash64(lit("gins"), $"vec_id"), lit(GraphInsert.DeltaMod)) === 0L
    val base = pts.filter(!isDelta).localCheckpoint()
    val delta = pts.filter(isDelta)
    // base serving graph: the SAME build-once IndexStore table as q477,
    // through the shared builder so convergence memoizes JVM-wide
    val (bt, baseConverged) = GraphInsert.ensureBaseGraph(s, dir, base)
    require(baseConverged, "qs22 base graph build must converge")
    var graph = org.apache.spark.sql.graftbridge.PlanBridge
      .checkpointResetStats(s.table(bt))
    val entries = base.select($"vec_id".as("node"))
      .orderBy(xxhash64($"node"), $"node").limit(GraphServe.Entries)
      .localCheckpoint()
    def recap(edges: DataFrame): DataFrame =
      graft.plans.TopK.perGroup(
        edges
          .join(pts.select($"vec_id".as("a"), $"x".as("ax"), $"y".as("ay")),
            "a")
          .join(pts.select($"vec_id".as("b"), $"x".as("bx"), $"y".as("by")),
            "b")
          .select($"a", $"b",
            (($"ax" - $"bx") * ($"ax" - $"bx") +
              ($"ay" - $"by") * ($"ay" - $"by")).as("d2")),
        Seq("a"), Seq("d2" -> true, "b" -> true), GraphServe.MaxDegree)
        .select($"a", $"b")
    val dRows = delta.select($"vec_id".as("qid"), $"x".as("qx"),
      $"y".as("qy")).as[BenchServeQuery].collect().toSeq.sortBy(_.qid)
    require(dRows.nonEmpty, "qs22 needs a non-empty delta batch")
    val stream = MemoryStream[BenchServeQuery]
    val q = stream.toDF()
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("bench-gins-ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val dq = batch.localCheckpoint()
          val beam0 = graft.plans.TopK.perGroup(
            GraphServe.withDist(pts, dq)(
              dq.select($"qid").crossJoin(broadcast(entries))),
            Seq("qid"), Seq("d2" -> true, "node" -> true), GraphServe.Beam)
          val beam = GraphServe.walk(pts, dq, graph, beam0,
            GraphServe.Beam, GraphServe.Hops)
          val newEdges = beam.select($"qid".as("a"), $"node".as("b"))
          graph = org.apache.spark.sql.graftbridge.PlanBridge
            .checkpointResetStats(recap(
              graph.unionByName(newEdges)
                .unionByName(newEdges.select($"b".as("a"), $"a".as("b")))
                .distinct()))
        }
        ()
      }
      .start()
    dRows.grouped(dRows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    // every streamed delta must be wired in
    val wired = graph.select($"a".as("vec_id")).distinct()
      .join(delta.select($"vec_id"), "vec_id").count()
    require(wired == dRows.size.toLong,
      s"qs22: only $wired of ${dRows.size} delta nodes entered the graph")
    // final serving gate: full-corpus truth over the evolved graph
    val queries = GraphServe.serveQueries(pts)
    val nq = queries.count()
    val truth = GraphServe.exactTruth(pts, queries)
    val allEntries = pts.select($"vec_id".as("node"))
      .orderBy(xxhash64($"node"), $"node").limit(GraphServe.Entries)
    val qBeam0 = graft.plans.TopK.perGroup(
      GraphServe.withDist(pts, queries)(
        queries.select($"qid").crossJoin(broadcast(allEntries))),
      Seq("qid"), Seq("d2" -> true, "node" -> true), GraphServe.Beam)
    val qBeam = GraphServe.walk(pts, queries, graph, qBeam0,
      GraphServe.Beam, GraphServe.Hops)
    val hits = GraphServe.beamAnswer(qBeam).join(truth, "qid")
      .filter($"a_node" === $"t_node").count()
    val recall = if (nq == 0) 0L else 1000L * hits / nq
    require(recall >= GraphInsert.InsertRecallFloorPermille,
      s"qs22 recall $recall below ${GraphInsert.InsertRecallFloorPermille}")
    Seq((nq, dRows.size.toLong, recall))
      .toDF("n_queries", "n_inserted", "recall_permille")
  }

  /** qs24 — the BUILT-IN watermark-scoped dedup
    * (`dropDuplicatesWithinWatermark`, [[EventStreams.dedupWithinWatermark]])
    * over [[BloomBatches]] micro-batches: times the native dedup
    * state-store path next to qs01's custom Bloom filter;
    * WatermarkDedupSpec pins both eviction directions.
    */
  val qs24WatermarkDedupStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_wmdedup_${runId.incrementAndGet()}"
    val q = EventStreams.dedupWithinWatermark(stream.toDS().toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-wmdedup-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val out = s.table(name).count()
    s.catalog.dropTempView(name)
    Seq((rows.size.toLong, out)).toDF("n_in", "n_out")
  }

  /** qs25 — cuckoo-filter DELETABLE membership ([[CuckooStream]]) over
    * [[BloomBatches]] micro-batches: each event becomes an add (or,
    * every third row, a delete of its own key), so the timing tracks
    * the fingerprint insert/kick/delete path per shard;
    * CuckooStreamSpec pins the no-false-negative and
    * delete-then-readmit laws.
    */
  val qs25CuckooStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir).map { e =>
      e.copy(event_type = if (e.event_id % 3 == 2) "del" else "add")
    }
    val stream = MemoryStream[Event]
    val name = s"bench_cuckoo_${runId.incrementAndGet()}"
    val q = CuckooStream.cuckooMembership(stream.toDS())
      .toDF("event_id", "user_id", "op", "member", "applied")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-cuckoo-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val t = s.table(name)
    val out = t.count()
    val live = t.filter(col("op") === "add" && col("member")).count()
    s.catalog.dropTempView(name)
    require(out == rows.size.toLong && live > 0,
      s"qs25: expected one emission per op, got $out of ${rows.size}")
    Seq((rows.size.toLong, out, live)).toDF("n_in", "n_out", "n_live_adds")
  }

  /** qs26 — streaming SLOPE ONE deviation-census maintenance
    * ([[SlopeOneStream]]): per micro-batch the delta-per-group IVM
    * update (touched baskets only), with the REQUIRE that the
    * maintained census equals the from-scratch recompute of the final
    * ratings table — maintained ≡ recomputed is the contract, and the
    * timing tracks the per-batch delta joins.
    */
  val qs26SlopeOneStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val state = new SlopeOneStream.DevState(s)
    val updates = stream.toDS().toDF()
      .select($"user_id".as("c"),
        expr("1 + pmod(event_id, 37)").as("p"),
        expr("CAST(1 + FLOOR(value) AS BIGINT)").as("r"))
    val q = SlopeOneStream.start(state, updates,
      Files.createTempDirectory("bench-so-ckpt").toString)
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val (nRatings, nPairs, ok) = SlopeOneStream.verifyAgainstRecompute(state)
    require(ok, "qs26: maintained devs diverged from the recompute")
    Seq((rows.size.toLong, nRatings, nPairs))
      .toDF("n_in", "n_ratings", "n_pairs")
  }

  /** qs27 — streaming RELATIVE-ERROR quantile census ([[ReqStream]],
    * q561's streaming twin): per-shard decimal log-bucket fold over
    * [[BloomBatches]] micro-batches; the merged shard censuses are
    * required BIT-IDENTICAL (serialized-bytes equality — counter
    * additivity, no tolerance band) to the one-pass census over the
    * same rows, and the sketch's p999 estimate is required within the
    * guaranteed 5% of the exact order statistic.
    */
  val qs27ReqStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_req_${runId.incrementAndGet()}"
    val q = ReqStream.reqSketches(stream.toDS())
      .toDF("shard", "census")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-req-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val emissions = s.table(name).select($"shard", $"census")
      .as[(Long, Array[Byte])].collect()
    s.catalog.dropTempView(name)
    val last = emissions.zipWithIndex
      .groupBy(_._1._1).map { case (_, es) => es.maxBy(_._2)._1._2 }.toSeq
    val merged = ReqStream.merge(last)
    val cents = rows.map(e => math.floor(100.0 * e.value).toLong)
      .filter(_ >= 1L)
    val batch = new ReqStream.ReqState
    cents.foreach(batch.update)
    require(java.util.Arrays.equals(merged.serialized, batch.serialized),
      "qs27: streamed-merged census differs from the batch one-pass census")
    val n = cents.length.toLong
    val k = 999L * (n - 1L) / 1000L + 1L
    val est = ReqStream.quantileEstimate(merged, k)
    val exact = cents.sorted.apply((k - 1L).toInt)
    require(math.abs(est - exact) * 20L <= exact,
      s"qs27: p999 estimate $est outside 5% of exact $exact")
    Seq((n, merged.counts.size.toLong, est))
      .toDF("n_in", "n_buckets", "p999_est")
  }

  /** qs28 — DGIM sliding-window counting ([[DgimStream]]): per-shard
    * exponential-bucket fold over [[BloomBatches]] micro-batches; each
    * shard's estimate of "qualifying events in the last
    * [[DgimStream.DgimWindow]] positions" is required inside the
    * paper's bound (|est − exact| ≤ exact/2 + 1) against the exact
    * count replayed from the fed rows in the same pinned order.
    */
  val qs28DgimStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = boundedEvents(s, dir)
    val stream = MemoryStream[Event]
    val name = s"bench_dgim_${runId.incrementAndGet()}"
    val q = DgimStream.dgimCounts(stream.toDS())
      .toDF("shard", "pos", "est")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-dgim-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val emissions = s.table(name).select($"shard", $"pos", $"est")
      .as[(Long, Long, Long)].collect()
    s.catalog.dropTempView(name)
    val last = emissions.zipWithIndex
      .groupBy(_._1._1).map { case (_, es) => es.maxBy(_._2)._1 }.toSeq
    // exact replay: same shard hash, same (ts, event_id) fold order —
    // NOTE the per-batch sort is batch-scoped, so the replay applies it
    // batch by batch exactly as the processor saw the rows
    val chunks = rows.grouped(rows.size / BloomBatches + 1).toSeq
    val perShard = chunks.flatMap(_.sortBy(e => (e.ts.getTime, e.event_id)))
      .groupBy(e => java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(e.user_id.toString), 8).toLong)
    var totalEst = 0L
    var totalExact = 0L
    last.foreach { case (shard, pos, est) =>
      val sh = perShard(shard)
      require(pos == sh.size.toLong,
        s"qs28: shard $shard position $pos != fed ${sh.size}")
      val window = sh.takeRight(math.min(DgimStream.DgimWindow, pos).toInt)
      val exact = window.count(_.value >= DgimStream.DgimThreshold).toLong
      require(math.abs(est - exact) <= exact / 2L + 1L,
        s"qs28: shard $shard estimate $est outside the DGIM bound of " +
          s"exact $exact")
      totalEst += est; totalExact += exact
    }
    Seq((last.size.toLong, totalEst, totalExact))
      .toDF("n_shards", "total_est", "total_exact")
  }

  /** qs29 — STREAMING length-bucketed batching ([[BucketBatchStream]],
    * q581's streaming twin): per-(shard, bucket) open-batch fold over
    * a SEQUENCED doc stream in [[BloomBatches]] micro-batches; the
    * merged tail-closed shard ledgers are required IDENTICAL — every
    * column, waste_ppm included — to the q581 batch ledger over the
    * same docs (bit-identity convention, no tolerance), and state
    * stays |buckets|-bounded per shard.
    */
  val qs29BucketBatchStream: Q = (s, dir) => withStreamConfs(s) {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val W = graft.llm.LengthBucketing.BucketWidth
    val B = graft.llm.LengthBucketing.TokBudget
    val Sh = graft.llm.LengthBucketing.Shards
    val lens = T.documents(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("len"))
      .filter($"doc_id" < 2000L)
      .localCheckpoint()
    // q581's exact shard + order: the sequenced feed IS the loader's
    // consumption contract
    val rows = lens
      .withColumn("shard", expr(
        s"CAST(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4)," +
          s" 16, 10) AS INT) % $Sh AS BIGINT)"))
      .withColumn("ord", md5($"doc_id".cast("string")))
      .orderBy($"ord", $"doc_id")
      .select($"shard", $"len")
      .collect().zipWithIndex
      .map { case (r, i) => (r.getLong(0), i.toLong, r.getLong(1)) }
      .toSeq
    val stream = MemoryStream[(Long, Long, Long)]
    val name = s"bench_loader_${runId.incrementAndGet()}"
    val q = BucketBatchStream.loaderStates(stream.toDS(), W, B)
      .toDF("shard", "state")
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("bench-loader-ckpt").toString)
      .start()
    rows.grouped(rows.size / BloomBatches + 1).foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val emissions = s.table(name).select($"shard", $"state")
      .as[(Long, Array[Byte])].collect()
    s.catalog.dropTempView(name)
    val last = emissions.zipWithIndex
      .groupBy(_._1._1).map { case (_, es) => es.maxBy(_._2)._1._2 }.toSeq
    val streamed = BucketBatchStream.mergedLedger(last)
      .map { case (b, nd, nb, real, padded) =>
        val waste = padded - real
        (b, nd, nb, real, padded, waste,
          (BigInt(waste) * 1000000 / BigInt(padded)).toLong)
      }
    val batch = graft.llm.LengthBucketing.ledger(lens, W, B, Sh)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    require(streamed == batch,
      s"qs29: streamed ledger diverged from batch:\n$streamed\nvs\n$batch")
    val stateBuckets = last.map(b =>
      BucketBatchStream.deserialize(b).buckets.size.toLong).max
    Seq((rows.size.toLong, batch.length.toLong, stateBuckets))
      .toDF("n_docs", "n_buckets", "max_state_buckets")
  }

  val benchOnly: Map[String, Q] = Map(
    "qs29_bucket_batch_stream" -> qs29BucketBatchStream,
    "qs28_dgim_stream" -> qs28DgimStream,
    "qs27_req_stream" -> qs27ReqStream,
    "qs26_slope_one_stream" -> qs26SlopeOneStream,
    "qs25_cuckoo_stream" -> qs25CuckooStream,
    "qs24_watermark_dedup_stream" -> qs24WatermarkDedupStream,
    "qs23_count_sketch_stream" -> qs23CountSketchStream,
    "qs22_graph_insert_stream" -> qs22GraphInsertStream,
    "qs21_beam_serve_stream" -> qs21BeamServeStream,
    "qs20_stream_static_join" -> qs20StreamStaticJoin,
    "qs19_sliding_hll_stream" -> qs19SlidingHllStream,
    "qs18_ewma_stream" -> qs18EwmaStream,
    "qs17_cusum_stream" -> qs17CusumStream,
    "qs16_psi_stream" -> qs16PsiStream,
    "qs13_reservoir_stream" -> qs13ReservoirStream,
    "qs14_session_stream" -> qs14SessionStream,
    "qs15_lsh_dedup_stream" -> qs15LshDedupStream,
    "qs01_bloom_dedup_stream" -> qs01BloomDedupStream,
    "qs02_cdc_apply_stream" -> qs02CdcApplyStream,
    "qs03_cms_stream" -> qs03CmsStream,
    "qs04_anomaly_stream" -> qs04AnomalyStream,
    "qs05_asof_stream" -> qs05AsOfStream,
    "qs06_funnel_stream" -> qs06FunnelStream,
    "qs07_chained_stream" -> qs07ChainedStream,
    "qs08_kll_stream" -> qs08KllStream,
    "qs09_fullouter_join_stream" -> qs09FullOuterJoinStream,
    "qs10_topk_stream" -> qs10TopKStream,
    "qs11_hll_stream" -> qs11HllStream,
    "qs12_bitmap_stream" -> qs12BitmapStream,
  )
}
