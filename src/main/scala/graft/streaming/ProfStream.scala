package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Dev profiling main (r15 verdict ask #8): the RocksDB state path at
  * the ×10 slice. The qs bench entries are harness-bounded (20k
  * events / 1000 docs) so the streaming family had no measured
  * scaling row like every batch family does; this main runs the three
  * heaviest stateful shapes — Bloom dedup (qs01's op), LSH dedup
  * (qs15's op), HNSW streaming insert (the full qs22 entry) — at ×10
  * input and prints PER-BATCH latency plus state/output sizes, so
  * state-store growth vs batch count is a recorded number in
  * BASELINE.md, not a guess.
  *
  * Usage: runMain graft.streaming.ProfStream [sfDir] [x10Dir]
  * (defaults /root/testdata/sf0.1 and the /tmp/sf1 stress slice).
  */
object ProfStream {

  /** ×10 the qs01 BenchRows cap; 10 micro-batches so the per-batch
    * trend (state grows monotonically) is visible.
    */
  val ProfRows = 200000L
  val ProfBatches = 10

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val x10Dir = if (args.length > 1) args(1) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the qs-family streaming confs (StreamBench.withStreamConfs):
    // RocksDB state, changelog checkpointing, 8 state partitions
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def feedTimed[A](stream: MemoryStream[A],
        q: org.apache.spark.sql.streaming.StreamingQuery,
        chunks: Iterator[Seq[A]], tag: String): Unit = {
      var i = 0
      chunks.foreach { chunk =>
        i += 1
        val t0 = System.nanoTime()
        stream.addData(chunk)
        q.processAllAvailable()
        println(f"[profstream] $tag batch $i%2d rows=${chunk.size}%6d " +
          f"secs=${(System.nanoTime() - t0) / 1e9}%6.2f")
      }
    }

    // ---- 1. Bloom streaming dedup (qs01's op) at ×10 rows ----------
    {
      val rows = T.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .filter(col("event_id") < ProfRows)
        .as[Event].collect().toSeq.sortBy(_.event_id)
      val stream = MemoryStream[Event]
      val q = EventStreams.bloomDedup(stream.toDS())
        .writeStream.format("memory").queryName("prof_bloom")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("prof-bloom-ckpt").toString)
        .start()
      val t0 = System.nanoTime()
      feedTimed(stream, q,
        rows.grouped(rows.size / ProfBatches + 1), "bloom")
      q.stop(); q.awaitTermination()
      val out = spark.table("prof_bloom").count()
      spark.catalog.dropTempView("prof_bloom")
      println(f"[profstream] bloom TOTAL rows=${rows.size} kept=$out " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    // ---- 2. LSH streaming dedup (qs15's op) at ×10 docs ------------
    {
      val docs = T.documents(spark, x10Dir).select($"doc_id", $"text")
        .localCheckpoint()
      val rows = LshDedupStream.bandRows(docs)
        .as[(Long, Int, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
      val stream = MemoryStream[(Long, Int, Long)]
      val q = LshDedupStream.ownerStream(stream.toDS())
        .toDF("band", "band_hash", "owner")
        .writeStream.format("memory").queryName("prof_lsh")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("prof-lsh-ckpt").toString)
        .start()
      val t0 = System.nanoTime()
      feedTimed(stream, q,
        rows.grouped(rows.size / ProfBatches + 1), "lsh")
      q.stop(); q.awaitTermination()
      val buckets = spark.table("prof_lsh")
        .select($"band", $"band_hash").distinct().count()
      spark.catalog.dropTempView("prof_lsh")
      println(f"[profstream] lsh TOTAL docs=${docs.count()} " +
        f"bandRows=${rows.size} stateBuckets=$buckets " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    // ---- 3. HNSW streaming insert — the FULL qs22 entry at the ×10
    // dir (its sizing derives from the dir's embeddings table) -------
    {
      val t0 = System.nanoTime()
      val out = StreamBench.qs22GraphInsertStream(spark, x10Dir).collect()
      println(f"[profstream] qs22@x10 ${out.mkString(",")} " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
