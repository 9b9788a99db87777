package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.core.dsl

/** One event from the `events` stream (ts already truncated to µs —
  * see [[graft.core.Tables.events]]).
  */
case class Event(event_id: Long, user_id: Long, event_type: String,
    ts: java.sql.Timestamp, value: Double)

/** Per-user running count emitted by [[EventStreams.runningCounts]]. */
case class UserCount(user_id: Long, n_events: Long)

/** One tagged input row of the streaming as-of join (side 1 = left /
  * probe, side 0 = right / reference).
  */
case class AsOfRow(user_id: Long, side: Int, id: Long,
    ts: java.sql.Timestamp, value: Double)

/** One output row of [[EventStreams.streamingAsOf]] — matched_* are
  * None for an unmatched probe under left-outer semantics
  * (keepUnmatched), mirroring the batch AsOfJoin's null payload.
  */
case class AsOfMatched(event_id: Long, user_id: Long,
    event_ts: java.sql.Timestamp, matched_id: Option[Long],
    matched_ts: Option[java.sql.Timestamp], matched_value: Option[Double])

/** Structured Streaming execution of the event-time operators whose
  * batch twins live in [[StreamShapeQueries]] (q60/q63 are the
  * oracle-checked ground truth; EventStreamsSpec asserts batch/stream
  * equivalence on identical input).
  *
  * This is the generalization of the reference's incremental refresh
  * (/root/reference/cache.go:54-66: recompute only when upstream moved):
  * the same logical plans run incrementally with watermark-bounded
  * state instead of full recomputation.
  *
  * Scale notes: streaming state is partitioned by the grouping key
  * exactly like a batch shuffle, so executor count scales it
  * horizontally; the watermark bounds state size (late rows beyond it
  * are dropped, which is what makes 100 TB/day streams feasible);
  * `transformWithState` keeps per-key state in RocksDB off-heap at
  * scale.
  */
object EventStreams {

  /** Watermarked tumbling-window aggregate — the streaming twin of
    * [[StreamShapeQueries.q60TumblingWindow]]. Append mode emits each
    * window exactly once, when the watermark passes its end; rows later
    * than `watermarkDelay` behind the max seen ts are dropped.
    */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
      width: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), dsl.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked sliding-window aggregate — the streaming twin of
    * [[StreamShapeQueries.q61SlidingWindow]]: every event lands in
    * width/slide windows; each window finalizes once its end passes the
    * watermark.
    */
  def slidingCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
      width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width, slide))
      .agg(count(lit(1)).as("n"), dsl.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"),
        col("sum_value"))

  /** Watermarked session windows per user — the streaming twin of
    * [[StreamShapeQueries.q62SessionWindow]]. Session state merges
    * across micro-batches until the watermark passes a session's
    * gap-extended end, then the session finalizes and emits once
    * (append mode).
    */
  def sessionCounts(events: DataFrame, gap: String = "10 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("last_ts"))

  /** Streaming dedup keeping the first arrival per (user, event_type) —
    * the streaming twin of [[StreamShapeQueries.q63DedupKeepEarliest]]
    * (identical when arrival order follows event_id). The watermark
    * bounds the dedup state: keys older than it are evicted, so state
    * is O(keys-per-watermark-window), not O(stream).
    */
  def dedupWithinWatermark(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** CHAINED stateful operators in ONE streaming query — watermarked
    * dedup feeding a tumbling-window aggregate, the Spark 3.5+
    * multi-stateful-pipeline capability (before it, each stateful op
    * needed its own query + intermediate sink; the single query shares
    * one watermark timeline and checkpoints both state stores
    * atomically). The dedup emits exactly the first arrival per
    * (user, event_type) inside the watermark, and the downstream window
    * aggregate counts the SURVIVORS — duplicate-resistant traffic
    * rollups in one pass. Spec pins batch equivalence; qs07 times the
    * stacked state path.
    */
  def dedupedTumblingCounts(events: DataFrame,
      watermarkDelay: String = "10 minutes",
      width: String = "1 hour"): DataFrame =
    dedupWithinWatermark(events, watermarkDelay) // the q63 leg, composed
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Approximate streaming dedup via Bloom-filter state — the
    * production form of [[dedupWithinWatermark]] at 100 TB/day, where
    * even watermark-bounded exact state (one stored row PER DISTINCT
    * KEY) outgrows the state store. Keys are sharded; each shard keeps
    * ONE fixed-size bit array in `ValueState[Array[Byte]]`, so total
    * state is `numShards · bits/8` bytes — constant in the number of
    * keys, while exact dedup's state grows linearly with them (the
    * EventStreamsSpec proves both sides of that contract via state-store
    * row metrics).
    *
    * Accuracy contract (classical Bloom bounds):
    *   - NO false negatives: a key once admitted always has all `hashes`
    *     bits set, so a true duplicate is never re-emitted;
    *   - false positives DROP some first arrivals, at rate
    *     `(1 − e^(−hashes·n/bits))^hashes` per lookup after `n` distinct
    *     keys hit a shard. At the defaults (2^16 bits = 8 KiB/shard,
    *     4 hashes) a shard that has absorbed 2 000 keys misreads the
    *     2 001st with probability ≈ 1.7·10⁻⁴.
    * A production deployment rotates the filter per time epoch (swap on
    * watermark advance) the way exact dedup evicts on watermark; the
    * epoch rotation is orthogonal to the mechanism pinned here.
    *
    * Bit positions use Kirsch–Mitzenmacher double hashing (h1 + i·h2):
    * two murmur3 passes serve any number of probe positions.
    */
  class BloomDedupProcessor(bits: Int, hashes: Int)
      extends StatefulProcessor[Long, Event, Event] {
    @transient private var filter: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      filter = getHandle.getValueState[Array[Byte]]("bloom",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Event] = {
      val bytes = if (filter.exists()) filter.get()
        else new Array[Byte](bits / 8)
      val out = Vector.newBuilder[Event]
      rows.foreach { e =>
        val k = s"${e.user_id}|${e.event_type}"
        val h1 = scala.util.hashing.MurmurHash3.stringHash(k, 0x9747b28c)
        val h2 = scala.util.hashing.MurmurHash3.stringHash(k, 0x85ebca6b) | 1
        var i = 0
        var unseen = false
        while (i < hashes) {
          val pos = java.lang.Math.floorMod(h1 + i * h2, bits)
          if ((bytes(pos >> 3) & (1 << (pos & 7))) == 0) {
            unseen = true
            bytes(pos >> 3) = (bytes(pos >> 3) | (1 << (pos & 7))).toByte
          }
          i += 1
        }
        if (unseen) out += e
      }
      filter.update(bytes)
      out.result().iterator
    }
  }

  /** Shard-and-filter entry point for [[BloomDedupProcessor]]. Sharding
    * by key hash spreads the bit arrays across state partitions (and
    * thus executors) exactly like any keyed state; `numShards` scales
    * the total filter capacity, `bits`/`hashes` trade memory for the
    * false-positive rate documented on the processor.
    */
  def bloomDedup(events: Dataset[Event], numShards: Int = 8,
      bits: Int = 1 << 16, hashes: Int = 4): Dataset[Event] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(s"${e.user_id}|${e.event_type}"), numShards).toLong
    }.transformWithState(new BloomDedupProcessor(bits, hashes),
      TimeMode.None(), OutputMode.Update(), Encoders.product[Event])
  }

  /** Epoch-rotated variant of [[BloomDedupProcessor]] — the missing
    * piece for an UNBOUNDED stream: a single filter saturates (bits only
    * ever get set, so the false-positive rate climbs toward 1 with the
    * total distinct keys ever seen). Rotation bounds the pressure the
    * way exact dedup's watermark eviction does: each shard keeps TWO bit
    * arrays — the current event-time epoch's and the previous one's —
    * and when the stream's event time enters a new epoch, previous ←
    * current, current ← empty.
    *
    * Contract (the bounded-staleness form of dedup, matching
    * [[dedupWithinWatermark]]'s semantics under a `epochSec` watermark):
    *   - a duplicate whose first arrival is in the SAME or the PREVIOUS
    *     epoch is never re-emitted (membership is checked against both
    *     filters) — suppression window ∈ [epochSec, 2·epochSec);
    *   - a duplicate older than two epochs may re-emit, exactly as an
    *     older-than-watermark key re-emits from exact dedup;
    *   - false-positive pressure is bounded by the distinct keys of TWO
    *     epochs, not the stream's lifetime — state stays 2·bits/8 bytes
    *     per shard forever.
    * Late rows (event time before the current epoch) are checked against
    * both filters and admitted into the CURRENT one — never dropped by
    * the rotation itself.
    */
  class EpochBloomDedupProcessor(bits: Int, hashes: Int, epochSec: Long)
      extends StatefulProcessor[Long, Event, Event] {
    @transient private var state
        : ValueState[(Long, Array[Byte], Array[Byte])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Array[Byte], Array[Byte])](
        "epochBloom", Encoders.product[(Long, Array[Byte], Array[Byte])],
        TTLConfig.NONE)

    private def test(bytes: Array[Byte], pos: Int): Boolean =
      (bytes(pos >> 3) & (1 << (pos & 7))) != 0

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Event] = {
      var (epoch, cur, prev) = if (state.exists()) state.get()
        else (Long.MinValue, new Array[Byte](bits / 8),
          new Array[Byte](bits / 8))
      val out = Vector.newBuilder[Event]
      rows.foreach { e =>
        val rowEpoch = java.lang.Math.floorDiv(e.ts.getTime / 1000, epochSec)
        if (epoch == Long.MinValue) epoch = rowEpoch
        else if (rowEpoch == epoch + 1) {
          prev = cur; cur = new Array[Byte](bits / 8); epoch = rowEpoch
        } else if (rowEpoch > epoch + 1) {
          prev = new Array[Byte](bits / 8)
          cur = new Array[Byte](bits / 8); epoch = rowEpoch
        } // rowEpoch <= epoch: late row — check both, insert into cur
        val k = s"${e.user_id}|${e.event_type}"
        val h1 = scala.util.hashing.MurmurHash3.stringHash(k, 0x9747b28c)
        val h2 = scala.util.hashing.MurmurHash3.stringHash(k, 0x85ebca6b) | 1
        var i = 0
        var inCur = true
        var inPrev = true
        while (i < hashes) {
          val pos = java.lang.Math.floorMod(h1 + i * h2, bits)
          if (!test(cur, pos)) inCur = false
          if (!test(prev, pos)) inPrev = false
          i += 1
        }
        if (!inCur && !inPrev) {
          var j = 0
          while (j < hashes) {
            val pos = java.lang.Math.floorMod(h1 + j * h2, bits)
            cur(pos >> 3) = (cur(pos >> 3) | (1 << (pos & 7))).toByte
            j += 1
          }
          out += e
        }
      }
      state.update((epoch, cur, prev))
      out.result().iterator
    }
  }

  /** [[bloomDedup]] with per-epoch filter rotation — the form that runs
    * forever. Suppression window [epochSec, 2·epochSec); state
    * `numShards · 2 · bits/8` bytes, constant in stream length.
    */
  def epochBloomDedup(events: Dataset[Event], numShards: Int = 8,
      bits: Int = 1 << 16, hashes: Int = 4,
      epochSec: Long = 3600): Dataset[Event] = {
    import events.sparkSession.implicits._
    events.groupByKey { e =>
      java.lang.Math.floorMod(scala.util.hashing.MurmurHash3
        .stringHash(s"${e.user_id}|${e.event_type}"), numShards).toLong
    }.transformWithState(new EpochBloomDedupProcessor(bits, hashes, epochSec),
      TimeMode.None(), OutputMode.Update(), Encoders.product[Event])
  }

  /** Stream-stream interval join: each purchase joins the same user's
    * signups from the preceding `horizon` — attribution, the canonical
    * two-stream shape. BOTH sides carry watermarks and the time
    * condition is two-sided, so Spark derives state-cleanup bounds for
    * each side (without them, stream-stream join state grows forever —
    * THE failure mode at 100 TB/day). Inner join rows emit as soon as
    * both inputs arrive; state for rows older than watermark + horizon
    * is evicted.
    */
  def purchaseAttribution(purchases: DataFrame, signups: DataFrame,
      watermarkDelay: String = "10 minutes",
      horizon: String = "1 hour"): DataFrame =
    attributionJoin(purchases, signups, watermarkDelay, horizon, "inner")

  /** Stream-stream LEFT OUTER interval join: every purchase emits —
    * attributed ones as soon as both inputs arrive (the inner rows),
    * UNattributed ones with null signup columns only once the
    * watermark proves no matching signup can still arrive (outer-row
    * emission is watermark-gated; until then the purchase sits in join
    * state). This is the shape for "conversion + orphan" feeds where
    * downstream needs one row per purchase either way; the same
    * two-sided time bounds keep state eviction finite on both sides.
    */
  def unattributedPurchases(purchases: DataFrame, signups: DataFrame,
      watermarkDelay: String = "10 minutes",
      horizon: String = "1 hour"): DataFrame =
    attributionJoin(purchases, signups, watermarkDelay, horizon, "left_outer")

  /** Stream-stream FULL OUTER interval join — the attribution LEDGER:
    * one row per purchase AND per signup either way. Inner rows emit on
    * arrival; unattributed purchases emit with null signup columns and
    * unconverted signups (the churn side a left join never surfaces)
    * emit with null purchase columns, each only once the watermark
    * proves its window closed. Both outer directions are
    * watermark-gated against the same two-sided time bounds, so state
    * on both sides stays finite — the complete streaming join matrix
    * next to inner ([[purchaseAttribution]]) and left-outer
    * ([[unattributedPurchases]]).
    */
  def attributionLedger(purchases: DataFrame, signups: DataFrame,
      watermarkDelay: String = "10 minutes",
      horizon: String = "1 hour"): DataFrame =
    attributionJoin(purchases, signups, watermarkDelay, horizon, "full_outer")

  /** Stream-STATIC enrichment join: every streaming event picks up its
    * key's dimension attributes from a batch table — the classic
    * "enrich the firehose with the profile store" shape. Stateless by
    * construction (the static side is re-resolved per micro-batch, so a
    * dim TABLE that changes between batches is picked up on file-source
    * refresh), no watermark needed, and `broadcast` pins the plan every
    * micro-batch wants at scale: ship the dimension to the stream's
    * executors, never shuffle the stream. Left join keeps events whose
    * key has no dimension row — dropping them silently is the classic
    * enrichment bug.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  private def attributionJoin(purchases: DataFrame, signups: DataFrame,
      watermarkDelay: String, horizon: String, joinType: String): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    val s = signups
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user_id"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", watermarkDelay)
    p.join(s, expr(
      s"""user_id = s_user_id
         |AND purchase_ts >= signup_ts
         |AND purchase_ts <= signup_ts + interval $horizon""".stripMargin),
        joinType)
      // coalesce keys so full-outer's unmatched-right rows still carry
      // their user (identical to bare user_id for inner/left shapes)
      .select(col("purchase_id"),
        coalesce(col("user_id"), col("s_user_id")).as("user_id"),
        col("purchase_ts"), col("signup_id"), col("signup_ts"))
  }

  /** Stateful per-key processor: cumulative event count per user,
    * emitted on every update. ValueState keeps exactly one long per
    * user; no TTL (a production pipeline would set one to bound state
    * for dormant keys).
    */
  class RunningCount extends StatefulProcessor[Long, Event, UserCount] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(UserCount(key, n))
    }
  }

  /** Running per-user event counts via `transformWithState` (requires
    * the RocksDB state store provider).
    */
  def runningCounts(events: Dataset[Event]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningCount, TimeMode.None(),
        OutputMode.Update(), Encoders.product[UserCount])
  }

  /** Streaming as-of join — the incremental twin of
    * [[graft.operators.AsOfJoin.backward]]: for each left (probe) row,
    * the latest right (reference) row of the same key with right.ts ≤
    * left.ts, computed event-time-correctly over out-of-order streams.
    *
    * Mechanics: both sides are buffered in per-key ListState; an
    * event-time timer fires when the watermark passes a buffered left
    * row, at which point that row's match is FINAL — any still-missing
    * right row with smaller ts would be later than the watermark and is
    * dropped at ingest — so the pair emits exactly once (append mode).
    * State cleanup mirrors the correctness argument: flushed lefts are
    * evicted, and of the rights at-or-before the watermark only the
    * LATEST is retained (it is the only one a future left can still
    * match; future lefts all have ts > watermark).
    *
    * Scale: state per key = pending lefts within watermark delay + at
    * most one settled right + pending rights — the same bound the
    * stream-stream interval join ([[purchaseAttribution]]) gets from
    * its two-sided time condition, here derived for the asymmetric
    * as-of semantics Spark has no native operator for.
    */
  class StreamingAsOfProcessor(keepUnmatched: Boolean)
      extends StatefulProcessor[Long, AsOfRow, AsOfMatched] {
    @transient private var lefts: ListState[AsOfRow] = _
    @transient private var rights: ListState[AsOfRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lefts = getHandle.getListState[AsOfRow]("lefts",
        Encoders.product[AsOfRow], TTLConfig.NONE)
      rights = getHandle.getListState[AsOfRow]("rights",
        Encoders.product[AsOfRow], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[AsOfRow],
        timerValues: TimerValues): Iterator[AsOfMatched] = {
      var maxLeftTs = Long.MinValue
      rows.foreach { r =>
        if (r.side == 1) { lefts.appendValue(r); maxLeftTs = math.max(maxLeftTs, r.ts.getTime) }
        else rights.appendValue(r)
      }
      // fire once the watermark passes the newest buffered left; earlier
      // lefts flush in the same expiry (ts ≤ wm check there)
      if (maxLeftTs != Long.MinValue) getHandle.registerTimer(maxLeftTs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AsOfMatched] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val allLefts = lefts.get().toSeq
      val allRights = rights.get().toSeq
      val (ready, pendingL) = allLefts.partition(_.ts.getTime <= wm)
      val out = ready.sortBy(l => (l.ts.getTime, l.id)).flatMap { l =>
        val m = allRights.filter(_.ts.getTime <= l.ts.getTime)
        if (m.isEmpty) {
          // no reference row exists at-or-before this probe (final — an
          // earlier right would now be beyond the watermark): drop under
          // inner semantics, emit a null match under left-outer
          if (keepUnmatched)
            Some(AsOfMatched(l.id, key, l.ts, None, None, None))
          else None
        } else {
          val best = m.maxBy(r => (r.ts.getTime, r.id))
          Some(AsOfMatched(l.id, key, l.ts,
            Some(best.id), Some(best.ts), Some(best.value)))
        }
      }
      // rights: keep everything still ahead of the watermark, plus the
      // single latest settled one (the only candidate future lefts need)
      val (settled, pendingR) = allRights.partition(_.ts.getTime <= wm)
      val keepR = pendingR ++
        (if (settled.nonEmpty) Seq(settled.maxBy(r => (r.ts.getTime, r.id)))
         else Nil)
      if (pendingL.isEmpty) lefts.clear() else lefts.put(pendingL.toArray)
      if (keepR.isEmpty) rights.clear() else rights.put(keepR.toArray)
      out.iterator
    }
  }

  /** Final funnel verdict for one user: the furthest stage reached
    * (1 = signed up, 2 = viewed within the horizon, 3 = purchased
    * within the horizon of that view).
    */
  case class FunnelStage(user_id: Long, stage: Int)

  /** Streaming twin of the batch conversion funnel
    * ([[graft.relational.AnalyticalQueries.q94Funnel]]): per-user stage
    * resolution over an out-of-order event stream, emitting each user's
    * FINAL stage exactly once (append mode) as soon as the watermark
    * proves it cannot change.
    *
    * Finalization logic (h = horizon):
    *   - t_s = min signup ts is final once wm ≥ t_s (no earlier signup
    *     can still arrive);
    *   - the stage-2 window [t_s, t_s+h] is decided once its best
    *     candidate view is ≤ wm (nothing earlier can arrive) or the
    *     window closed (wm > t_s+h, nothing can still enter it);
    *   - stage 3 resolves the same way from t_v.
    * State per user: buffered events, evicted wholesale at the single
    * final emission — bounded by the horizon within the watermark delay.
    */
  class FunnelProcessor(horizonMs: Long)
      extends StatefulProcessor[Long, AsOfRow, FunnelStage] {
    @transient private var buf: ListState[AsOfRow] = _
    @transient private var done: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[AsOfRow]("buf",
        Encoders.product[AsOfRow], TTLConfig.NONE)
      done = getHandle.getValueState[Boolean]("done",
        Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[AsOfRow],
        timerValues: TimerValues): Iterator[FunnelStage] = {
      if (done.exists() && done.get()) return Iterator.empty
      var maxTs = Long.MinValue
      rows.foreach { r => buf.appendValue(r); maxTs = math.max(maxTs, r.ts.getTime) }
      if (maxTs != Long.MinValue) getHandle.registerTimer(maxTs)
      Iterator.empty
    }

    /** Earliest candidate in [from, from+h], and whether that pick is
      * final under watermark wm (found one at-or-before wm, or the
      * window can no longer gain members).
      */
    private def resolve(cands: Seq[Long], from: Long,
        wm: Long): (Option[Long], Boolean) = {
      val in = cands.filter(t => t >= from && t <= from + horizonMs)
      val best = if (in.isEmpty) None else Some(in.min)
      val decided = best.exists(_ <= wm) || wm > from + horizonMs
      (best, decided)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelStage] = {
      if (done.exists() && done.get()) return Iterator.empty
      val wm = timerValues.getCurrentWatermarkInMs()
      val events = buf.get().toSeq
      val signups = events.filter(_.side == 0).map(_.ts.getTime)
      if (signups.isEmpty || signups.min > wm) return Iterator.empty
      val tS = signups.min // final: wm ≥ tS
      val views = events.filter(_.side == 1).map(_.ts.getTime)
      val purchases = events.filter(_.side == 2).map(_.ts.getTime)
      val (tV, vDecided) = resolve(views, tS, wm)
      if (!vDecided) return Iterator.empty
      val stage = tV match {
        case None => 1
        case Some(v) =>
          val (tP, pDecided) = resolve(purchases, v, wm)
          if (!pDecided) return Iterator.empty
          if (tP.isDefined) 3 else 2
      }
      done.update(true)
      buf.clear()
      Iterator.single(FunnelStage(key, stage))
    }
  }

  /** Run the streaming funnel over an events frame carrying
    * (event_id, user_id, event_type, ts, value). Sides: 0 = signup,
    * 1 = view, 2 = purchase; other event types are filtered out before
    * the stateful operator (smaller state, fewer timer wakeups).
    */
  def streamingFunnel(events: DataFrame, horizonMs: Long = 3600000L,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelStage] = {
    val s = events.sparkSession
    import s.implicits._
    val tagged = events
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"),
        when(col("event_type") === "signup", 0)
          .when(col("event_type") === "view", 1).otherwise(2).as("side"),
        col("event_id").as("id"), col("ts"), col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[AsOfRow]
    tagged.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(horizonMs), TimeMode.EventTime(),
        OutputMode.Append(), Encoders.product[FunnelStage])
  }

  /** Tag, union, watermark, and run the streaming as-of join. Left rows
    * are probes (side 1), right rows are the reference series (side 0);
    * both must carry (event_id, user_id, ts, value).
    */
  def streamingAsOf(left: DataFrame, right: DataFrame,
      watermarkDelay: String = "10 minutes",
      keepUnmatched: Boolean = false): Dataset[AsOfMatched] = {
    val s = left.sparkSession
    import s.implicits._
    val tagged = left.select(col("user_id"), lit(1).as("side"),
        col("event_id").as("id"), col("ts"), col("value"))
      .unionByName(right.select(col("user_id"), lit(0).as("side"),
        col("event_id").as("id"), col("ts"), col("value")))
      .withWatermark("ts", watermarkDelay)
      .as[AsOfRow]
    tagged.groupByKey(_.user_id)
      .transformWithState(new StreamingAsOfProcessor(keepUnmatched),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[AsOfMatched])
  }
}
