package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.relational.IncrementalQueries

/** Streaming CDC apply: a stream of whole-row updates becomes a
  * sequence of atomically-published table snapshots — `readStream` →
  * per-micro-batch keyed upsert ([[IncrementalQueries.upsert]]) against
  * the active snapshot → write → atomic pointer swap. This is the
  * streaming form of the reference's refresh loop (cache.go:54-66
  * recomputes when upstream moves; here only the changed keys are
  * re-applied, continuously), with the same crash-safe publish
  * discipline as [[graft.catalog.FbcIngest]] (tmp + ATOMIC_MOVE; a
  * reader always sees a complete snapshot).
  *
  * Scale notes: the per-batch work is ONE key join (broadcast for the
  * usual small CDC batch, by AQE's choice) over the current snapshot —
  * the full-rewrite-per-batch shape is right when batches are minutes
  * apart and the table fits a rewrite window; for higher cadence the
  * same upsert goes partition-targeted (join on the partition key
  * first, rewrite only touched partitions). Within-batch duplicate
  * keys collapse to the row with the highest `seqCol` BEFORE the
  * upsert (CDC streams are at-least-once; last-writer-wins needs an
  * explicit sequence, not arrival order).
  */
object CdcApply {

  /** Snapshot dir + ACTIVE pointer layout under `root`. */
  private def activePath(root: String) = Paths.get(root, "ACTIVE")

  /** The currently-published snapshot frame, or an empty frame with
    * `schema` before the first publish.
    */
  def activeState(s: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val p = activePath(root)
    if (Files.exists(p)) {
      val id = Files.readString(p).trim
      s.read.schema(schema).parquet(s"$root/snapshots/$id")
    } else s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
  }

  private def publish(root: String, id: String): Unit = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val tmp = rootP.resolve("ACTIVE.tmp")
    Files.write(tmp, id.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, activePath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Start applying `updates` (a streaming DataFrame of whole rows) to
    * the snapshot table at `root`, keyed by `keys`, collapsing
    * within-batch duplicates by the highest `seqCol`.
    */
  def start(updates: DataFrame, root: String, keys: Seq[String],
      seqCol: String, checkpoint: String): StreamingQuery = {
    val schema = updates.schema
    updates.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // last-writer-wins within the batch: keep the max-seq row per key
          val keyCols = keys.map(col)
          val latest = batch
            .withColumn("_s", struct(col(seqCol) +: batch.columns
              .filterNot(_ == seqCol).map(col): _*))
            .groupBy(keyCols: _*)
            .agg(max(col("_s")).as("_s"))
            .select(col("_s.*"))
            .select(schema.fieldNames.map(col): _*)
          val merged = IncrementalQueries
            .upsert(activeState(s, root, schema), latest, keys)
          val id = f"b$batchId%08d"
          merged.write.mode(SaveMode.Overwrite)
            .parquet(s"$root/snapshots/$id")
          publish(root, id)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
