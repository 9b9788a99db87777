package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The listener feed must reconcile with what was fed and with the
  * query's synchronous progress array, and the state-rows telemetry
  * must stay bounded by the key space.
  */
class ProgressAuditSpec extends SparkSpec {
  import spark.implicits._

  test("listener telemetry reconciles with fed rows and recentProgress") {
    val rows = (1L to 300L).map { i =>
      Event(i, i % 4, s"t${i % 3}",
        new Timestamp(1700000000000L + i * 1000L), 1.0)
    }
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val counts = stream.toDS().groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
    val (sync, audit) = ProgressAudit.audited(spark) {
      val q = counts.writeStream.format("memory")
        .queryName("progress_audit_spec").outputMode("complete")
        .option("checkpointLocation",
          Files.createTempDirectory("audit-ckpt").toString)
        .start()
      rows.grouped(100).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      val progress = q.recentProgress.toSeq
      q.stop(); q.awaitTermination()
      progress
    }
    spark.catalog.dropTempView("progress_audit_spec")
    // listener is async: wait (bounded) until it caught up with sync side
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def fedBatches = audit.batches.filter(_.numInputRows > 0)
    while (fedBatches.map(_.numInputRows).sum < rows.size &&
      System.nanoTime() < deadline) Thread.sleep(50)

    val got = fedBatches
    assert(got.map(_.numInputRows).sum == rows.size,
      s"listener saw ${got.map(_.numInputRows).sum} of ${rows.size} rows")
    // every listener batch must exist on the sync side with equal counts
    val syncById = sync.map(p => p.batchId -> p.numInputRows).toMap
    got.foreach { b =>
      assert(syncById.get(b.batchId).contains(b.numInputRows),
        s"batch ${b.batchId}: listener ${b.numInputRows} != sync " +
          s"${syncById.get(b.batchId)}")
    }
    // state telemetry: bounded by the 3-type key space, never shrinking
    got.foreach(b => assert(b.stateRowsTotal <= 3L,
      s"state rows ${b.stateRowsTotal} exceed key space"))
    assert(got.last.stateRowsTotal == 3L)
    assert(got.forall(_.stateMemoryBytes >= 0L))
  }
}
