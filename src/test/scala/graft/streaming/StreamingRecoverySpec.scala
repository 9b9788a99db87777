package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import org.apache.spark.sql.functions.{count, lit, window}

import graft.SparkSpec

/** Exactly-once recovery of a STATEFUL aggregate across a query
  * restart: stop a windowed-count query mid-stream (its windows still
  * open in the state store, its source offsets committed to the
  * checkpoint), then restart from the same checkpoint over a replayable
  * file source. The restarted query must finalize every window with the
  * full counts — which can only happen if the state store recovered,
  * because the file source will not re-read batch-1's committed files.
  * This is the recovery contract a production streaming deployment
  * leans on at every deploy/crash; no other spec exercised it.
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def writeOneFile(rows: Seq[Event], dirP: String, name: String): Unit = {
    val tmp = Files.createTempDirectory("recov_batch").toString
    spark.createDataset(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp))
      .filter(_.toString.endsWith(".parquet")).findFirst().orElseThrow()
    Files.createDirectories(Paths.get(dirP))
    Files.move(part, Paths.get(dirP, name), StandardCopyOption.ATOMIC_MOVE)
  }

  test("stateful windowed agg survives a restart from the checkpoint") {
    val all = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "ts", "value")
      .as[Event].collect().toSeq.sortBy(_.event_id)
    val (b1, b2) = all.splitAt(all.size / 2)
    val maxTs = all.map(_.ts.getTime).max
    val sentinel = Event(-1L, -1L, "sentinel",
      new Timestamp(maxTs + 24L * 3600 * 1000), 0.0)

    val in = Files.createTempDirectory("recov_in").toString
    val out = Files.createTempDirectory("recov_out").toString
    val ckpt = Files.createTempDirectory("recov_ckpt").toString
    // the memory sink cannot recover from a checkpoint; the parquet
    // FILE sink can — its _spark_metadata commit log is the production
    // exactly-once mechanism this test exercises end to end
    def runSegment(): Unit = {
      val q = EventStreams.tumblingCounts(
          spark.readStream.schema(spark.createDataset(all).schema).parquet(in))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop(); q.awaitTermination()
    }

    writeOneFile(b1, in, "batch1.parquet")
    // segment 1: early windows finalize and emit; the boundary hour and
    // everything later stays OPEN in the state store at stop time
    runSegment()

    writeOneFile(b2 :+ sentinel, in, "batch2.parquet")
    // segment 2 restarts from the checkpoint: the file source skips the
    // committed batch1 file, so full counts require recovered state
    runSegment()

    val emitted = spark.read.parquet(out) // respects _spark_metadata
      .filter($"event_type" =!= "sentinel")
      .select("window_start", "event_type", "n")
      .as[(Timestamp, String, Long)].collect().toSeq
    assert(emitted.size == emitted.toSet.size,
      "a finalized window was emitted twice across the restart")
    val streamed = emitted.toSet
    val batch = spark.createDataset(all).toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"event_type", $"n")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"windows lost counts across restart: streamed ${streamed.size} " +
        s"vs batch ${batch.size}")
  }
}
