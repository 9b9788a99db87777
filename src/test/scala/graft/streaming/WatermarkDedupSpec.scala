package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Both-direction eviction gate for the BUILT-IN watermark-scoped
  * dedup (`dropDuplicatesWithinWatermark` —
  * [[EventStreams.dedupWithinWatermark]]), the TtlStateSpec
  * convention applied to event time: a duplicate arriving while the
  * key's state is inside the watermark MUST drop; once the watermark
  * passes the first arrival by more than the delay, the state is
  * evicted and a later re-occurrence MUST re-emit. (The existing
  * EventStreamsSpec test pins batch equivalence on in-window data;
  * this spec pins the EVICTION boundary itself, which that test never
  * crosses.) Event-time semantics — no processing-time polling needed;
  * processAllAvailable quiesces each batch.
  */
class WatermarkDedupSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 12:00:00")
  private def at(min: Long) = new Timestamp(t0.getTime + min * 60000)
  private def ev(id: Long, user: Long, min: Long): Event =
    Event(id, user, "click", at(min), 0.0)

  /** Drive the batches; return the emitted event_ids. */
  private def run(batches: Seq[Seq[Event]]): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val name = s"t_wmdedup_${System.nanoTime()}"
    val q = EventStreams.dedupWithinWatermark(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("wmdedup-ckpt").toString)
      .start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop(); q.awaitTermination()
    val out = spark.table(name)
      .select("event_id").as[Long].collect().toSet
    spark.catalog.dropTempView(name)
    out
  }

  test("a duplicate inside the watermark window drops, across batches") {
    // watermark after batch 1 = 5min − 10min < 0, so user 7's state is
    // live when the batch-2 duplicate arrives
    val out = run(Seq(
      Seq(ev(1, 7, 0), ev(2, 99, 5)),
      Seq(ev(3, 7, 2), ev(4, 98, 6))))
    assert(out.contains(1L) && !out.contains(3L),
      s"in-watermark duplicate must drop: emitted $out")
    assert(out == Set(1L, 2L, 4L))
  }

  test("after the watermark passes first-arrival + delay, the key's " +
      "state is evicted and a re-occurrence re-emits") {
    // batch 2's 120min event advances the watermark to 110min — far
    // past user 7's 0min + 10min delay — so batch 3's 115min
    // re-occurrence must be ADMITTED, not deduped
    val out = run(Seq(
      Seq(ev(1, 7, 0)),
      Seq(ev(2, 99, 120)),
      Seq(ev(3, 7, 115))))
    assert(out.contains(3L),
      s"post-eviction re-occurrence must re-emit: emitted $out")
    assert(out == Set(1L, 2L, 3L))
  }
}
