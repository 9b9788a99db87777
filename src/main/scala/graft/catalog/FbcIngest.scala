package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import FbcModel._

/** ETL for FBC catalog streams — the reference's Extract/Transform/Load
  * path (SURVEY.md §2.a R4–R9; /root/reference/cache.go) re-expressed
  * Spark-first:
  *
  *   - the JSON stream is read as text lines so the verbatim blob is
  *     preserved (plain `read.json` would re-serialize and lose bytes;
  *     cache.go:111 writes the blob untouched);
  *   - the derived partition key applies the 3-way rule (cache.go:100-106);
  *   - instead of one file per record (cache.go:107 — an anti-pattern at
  *     scale: 100 TB would mean billions of tiny files), each
  *     `(package, schema)` partition holds JSONL, written via
  *     `partitionBy` so partition pruning replaces the reference's
  *     directory walks;
  *   - snapshots are immutable timestamped dirs published by atomically
  *     renaming an ACTIVE pointer file over the previous one — the
  *     Spark-world equivalent of cache.go:85-91's symlink swap, made
  *     idempotent (the reference wedges on a stale `next` symlink);
  *   - refresh is incremental: the source's max modification time is the
  *     version watermark (cache.go:54-66's If-Modified-Since), and an
  *     unchanged source is a no-op;
  *   - retention GC keeps the newest N snapshots (the reference's
  *     LRU+TTL eviction, cache.go:26-28, done by version count which is
  *     deterministic and cluster-friendly).
  *
  * Malformed records fail the load (the reference silently swallows
  * non-200 errors at cache.go:67-69 — we deliberately do not).
  */
object FbcIngest {

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss.SSS").withZone(ZoneOffset.UTC)

  /** Parse a catalog JSONL stream into the meta table, keeping the
    * verbatim blob. Corrupt lines (no parsable header schema) raise.
    */
  def readMetaStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.read.textFile(path).toDF("blob")
      .filter(length(trim($"blob")) > 0)
      .select(from_json($"blob", headerSchema).as("h"), $"blob")
      .select($"h.schema".as("schema"), $"h.package".as("package"),
        $"h.name".as("name"), $"blob")
    parsed
  }

  /** Apply the derived partition key (R6). */
  def withPackageKey(df: DataFrame): DataFrame =
    df.withColumn("package",
      packageKey(col("schema"), col("package"), col("name")))

  private val BadMetaMsg = "meta record lacks schema/name"

  /** Validate-and-write one immutable snapshot under
    * `root/snapshots/<ts>/` partitioned by (package, schema), and
    * atomically publish it as active. Returns the snapshot id.
    *
    * Validation is fused into the write pass with an inline raise_error
    * — ONE scan of the source, not a count() action followed by a second
    * full read (at 100 TB the extra pass is real money). A bad record
    * aborts the job before publish, surfaced as IllegalArgumentException.
    */
  def writeSnapshot(spark: SparkSession, meta: DataFrame, root: String,
      snapshotId: Option[String] = None, sourceWatermark: Long = 0L): String = {
    import spark.implicits._
    val id = snapshotId.getOrElse(tsFmt.format(Instant.now()))
    val snapDir = s"$root/snapshots/$id"
    val checkedSchema = when(col("schema").isNull || col("name").isNull,
        raise_error(concat(lit(s"$BadMetaMsg: "), coalesce($"blob", lit("")))))
      .otherwise(col("schema")).as("schema")
    try {
      withPackageKey(meta)
        .select($"package", checkedSchema, $"name", $"blob")
        .repartition(col("package"), col("schema"))
        .sortWithinPartitions("package", "schema", "name")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("package", "schema")
        .parquet(snapDir)
    } catch {
      case e: Throwable if causeChain(e).exists(
          m => m != null && m.contains(BadMetaMsg)) =>
        throw new IllegalArgumentException(
          s"refusing to load snapshot: $BadMetaMsg", e)
    }
    publishActive(root, id, sourceWatermark)
    id
  }

  private def causeChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(_.getMessage).toSeq

  /** Atomic publish: write ACTIVE.tmp then rename over ACTIVE.
    * Idempotent — a leftover tmp from a crashed publish is overwritten,
    * unlike the reference's EEXIST wedge (cache.go:85-87).
    */
  private def publishActive(root: String, id: String, watermark: Long): Unit = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val tmp = rootP.resolve("ACTIVE.tmp")
    Files.write(tmp, s"$id\n$watermark".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, rootP.resolve("ACTIVE"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The active snapshot id and its source watermark, if published. */
  def activeSnapshot(root: String): Option[(String, Long)] = {
    val p = Paths.get(root, "ACTIVE")
    if (!Files.exists(p)) None
    else Files.readString(p).split("\n").toList match {
      case id :: wm :: Nil => Some((id, wm.trim.toLong))
      case id :: Nil => Some((id.trim, 0L))
      case _ => None
    }
  }

  /** Read the active snapshot's meta table (partition-pruned scans). */
  def activeMeta(spark: SparkSession, root: String): DataFrame = {
    val (id, _) = activeSnapshot(root).getOrElse(
      throw new IllegalStateException(s"no active snapshot under $root"))
    spark.read.parquet(s"$root/snapshots/$id")
  }

  /** Published snapshot ids, oldest-first (ids sort chronologically —
    * timestamp-format by default, caller-supplied otherwise).
    */
  def listSnapshots(root: String): Seq[String] = {
    val snaps = Paths.get(root, "snapshots")
    if (!Files.exists(snaps)) return Nil
    import scala.jdk.CollectionConverters._
    val s = Files.list(snaps)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  /** TIME-TRAVEL read: the meta table of one specific published
    * version, active or not — the AS OF VERSION surface over the
    * snapshot layout (every version is a self-contained partitioned
    * dir, so historical reads cost the same partition-pruned scan as
    * the active one; retention GC bounds how far back this reaches).
    */
  def snapshotMeta(spark: SparkSession, root: String, id: String): DataFrame = {
    val dir = Paths.get(root, "snapshots", id)
    require(Files.exists(dir), s"no snapshot '$id' under $root " +
      s"(published: ${listSnapshots(root).mkString(", ")})")
    spark.read.parquet(dir.toString)
  }

  /** Incremental refresh: re-ingest only if the source's watermark (max
    * file mtime) moved past the active snapshot's — the reference's
    * If-Modified-Since conditional GET (cache.go:54-66). Returns the
    * (possibly pre-existing) active snapshot id.
    */
  def refreshIfChanged(spark: SparkSession, sourcePath: String,
      root: String): String = {
    val srcWm = sourceWatermark(sourcePath)
    activeSnapshot(root) match {
      case Some((id, wm)) if wm >= srcWm && srcWm > 0 => id
      case _ =>
        writeSnapshot(spark, readMetaStream(spark, sourcePath), root,
          sourceWatermark = srcWm)
    }
  }

  private def sourceWatermark(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_))
        .mapToLong(f => Files.getLastModifiedTime(f).toMillis).max.orElse(0L)
      finally s.close()
    }
  }

  /** Incremental ingest via the Structured Streaming file source with
    * `Trigger.AvailableNow`: the checkpoint tracks exactly which source
    * files have been processed, so a refresh reads ONLY files added
    * since the last run and appends them to the partitioned table —
    * per-file incrementality, unlike [[refreshIfChanged]]'s whole-source
    * mtime watermark (which re-ingests everything on any change). This
    * is the faithful Spark generalization of the reference's
    * If-Modified-Since conditional GET (cache.go:54-66).
    *
    * Scale notes: AvailableNow drains all pending files in rate-limited
    * micro-batches then stops — an incremental batch job, restart-safe
    * via the checkpoint; the parquet sink appends partition-pruned
    * (package, schema) directories exactly like the snapshot writer.
    */
  def refreshIncremental(spark: SparkSession, sourceDir: String,
      root: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val parsed = spark.readStream
      .text(sourceDir)
      .withColumnRenamed("value", "blob")
      .filter(length(trim($"blob")) > 0)
      .select(from_json($"blob", headerSchema).as("h"), $"blob")
      .select($"h.schema".as("schema"), $"h.package".as("package"),
        $"h.name".as("name"), $"blob")
    val checkedSchema = when(col("schema").isNull || col("name").isNull,
        raise_error(concat(lit(s"$BadMetaMsg: "), coalesce($"blob", lit("")))))
      .otherwise(col("schema")).as("schema")
    val q = withPackageKey(parsed)
      .select($"package", checkedSchema, $"name", $"blob")
      .writeStream
      .format("parquet")
      .option("path", s"$root/incremental/data")
      .option("checkpointLocation", s"$root/incremental/_checkpoint")
      .partitionBy("package", "schema")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The incrementally-maintained meta table (partition-pruned scans). */
  def incrementalMeta(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/incremental/data")

  /** Retention GC: delete all but the newest `keep` snapshots, never the
    * active one (fixes the reference's evict-before-load hazard,
    * cache.go:39).
    */
  def gcSnapshots(root: String, keep: Int): Seq[String] = {
    val snaps = Paths.get(root, "snapshots")
    if (!Files.exists(snaps)) return Nil
    val active = activeSnapshot(root).map(_._1)
    import scala.jdk.CollectionConverters._
    val all = {
      val s = Files.list(snaps)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
    val victims = all.dropRight(keep).filterNot(active.contains)
    victims.foreach { id =>
      val dir = snaps.resolve(id)
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
    victims
  }
}
