package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** One micro-batch's telemetry, as a pipeline monitor would persist
  * it: rows in, rows/s, and the stateful operators' memory footprint.
  */
case class BatchProgress(batchId: Long, numInputRows: Long,
    stateRowsTotal: Long, stateMemoryBytes: Long)

/** Streaming OBSERVABILITY via [[StreamingQueryListener]] — the
  * streaming twin of q253 (batch per-operator metrics read-back) and
  * q370 (declared observe() metrics): a production streaming job is
  * graded by its progress feed — input rate, batch duration, state
  * rows/memory — and the listener is the API that feed arrives on
  * (asynchronously, off the query thread, which is exactly why it
  * needs a certifying spec: the numbers must reconcile with what the
  * query itself reports synchronously via `recentProgress`).
  *
  * The audit keeps every [[QueryProgressEvent]]'s input-row count and
  * state-operator totals; [[ProgressAuditSpec]] reconciles them
  * against the fed row counts and the sync-side progress array, and
  * pins that state rows stay bounded by the key space (the qs01/qs03
  * constant-state contract read off TELEMETRY instead of internals —
  * the check an SRE's dashboard alert actually implements).
  */
class ProgressAudit extends StreamingQueryListener {
  private val events = new ConcurrentLinkedQueue[BatchProgress]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val stateMem = p.stateOperators.map(_.memoryUsedBytes).sum
    events.add(BatchProgress(p.batchId, p.numInputRows, stateRows, stateMem))
  }

  def batches: Seq[BatchProgress] = {
    val it = events.iterator()
    val buf = Seq.newBuilder[BatchProgress]
    while (it.hasNext) buf += it.next()
    buf.result()
  }
}

object ProgressAudit {
  /** Attach an audit listener for the duration of `body`. */
  def audited[A](s: SparkSession)(body: => A): (A, ProgressAudit) = {
    val audit = new ProgressAudit
    s.streams.addListener(audit)
    try (body, audit)
    finally s.streams.removeListener(audit)
  }
}
