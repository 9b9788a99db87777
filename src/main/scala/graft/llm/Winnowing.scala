package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Robust WINNOWING document fingerprinting (Schleimer, Wilkerson &
  * Aiken SIGMOD'03 — the MOSS algorithm): hash every k-token shingle,
  * slide a w-hash window, and select the RIGHTMOST MINIMUM of each
  * window. The guarantee the paper proves: any shared substring of
  * ≥ w+k−1 tokens yields at least one shared selected fingerprint
  * (unlike mod-p sampling, which can miss arbitrarily long matches),
  * while selecting ~2/(w+1) of positions. This is the seventh dedup
  * mode (exact q40, MinHash q41, SimHash q42, n-gram Jaccard q43,
  * embedding q112, semantic q164, CDC chunking q258) and the one
  * plagiarism/clone detectors actually ship.
  *
  * The reference (joelanford/console-etl) has no text surface; this is
  * a north-star [N] row from SURVEY.md §2.b.
  *
  * Determinism: the hash is the first 8 md5 hex chars of the shingle
  * (engine-independent, the q95/q141 idiom); rightmost-tie argmin is
  * pinned by a sequential fold whose `≤` keeps the later index — both
  * engines fold the same window order (Spark `aggregate` HOF, DuckDB
  * `list_reduce` with the q348 seed-element idiom).
  *
  * Scale shape: selection is per-doc array-local (zero shuffle, O(len·w)
  * work); the only corpus shuffle keys on the constant-width 8-hex
  * fingerprint; stop-fingerprints (doc frequency > [[StopFpDf]]) are
  * dropped before the pair join — the q43 per-bucket cap that bounds the
  * quadratic blowup a boilerplate-shingle would cause.
  */
object Winnowing {

  type Q = (SparkSession, String) => DataFrame

  /** Shingle size k and window w: guarantees detection of shared runs
    * of ≥ w+k−1 = 6 tokens, density ~2/(w+1).
    */
  val ShingleK = 3
  val WindowW = 4
  /** Fingerprints shared by more docs than this are boilerplate. */
  val StopFpDf = 20L
  /** Pair report threshold: ≥ this many shared selected fingerprints. */
  val MinShared = 2L

  /** Selected fingerprints per doc: (doc_id, fp) distinct. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    fingerprintsOf(T.documents(s, dir))

  /** Same over any (doc_id, text) frame — the spec plants shared runs. */
  def fingerprintsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withColumn("ts", expr("filter(split(text, ' '), t -> t <> '')"))
      .filter(size($"ts") >= ShingleK)
      .withColumn("hs", expr(
        s"""transform(sequence(0, size(ts) - $ShingleK),
           |  i -> CAST(conv(substring(md5(
           |         concat_ws(' ', ts[i], ts[i+1], ts[i+2])), 1, 8),
           |       16, 10) AS BIGINT))""".stripMargin))
      .withColumn("fp", explode(expr(
        s"""array_distinct(transform(
           |  sequence(0, greatest(size(hs) - $WindowW, 0)),
           |  i -> aggregate(
           |    sequence(i, least(i + $WindowW - 1, size(hs) - 1)),
           |    named_struct('j', -1, 'v', CAST(9223372036854775807 AS BIGINT)),
           |    (acc, j) -> IF(hs[j] <= acc.v,
           |      named_struct('j', j, 'v', hs[j]), acc)).v))""".stripMargin)))
      .select($"doc_id", $"fp")
  }

  /** q377 — winnowing near-dup pairs: docs sharing ≥ [[MinShared]]
    * selected fingerprints (stop-fingerprints excluded), with the
    * shared count as the match weight.
    */
  val q377Winnowing: Q = (s, dir) => {
    import s.implicits._
    val fp = fingerprints(s, dir).localCheckpoint() // feeds df + both join sides
    val keep = fp.groupBy($"fp").agg(countDistinct($"doc_id").as("df"))
      .filter($"df" <= StopFpDf)
      .select($"fp")
    val kept = fp.join(keep, "fp")
    kept.select($"fp", $"doc_id".as("doc_a"))
      .join(kept.select($"fp", $"doc_id".as("doc_b")), "fp")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= MinShared)
      .orderBy($"doc_a", $"doc_b")
  }

  val q377Sql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(ts) - ${ShingleK - 2}),
       |      i -> CAST(('0x' || substring(md5(
       |             ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 8))
       |           AS BIGINT)) AS hs
       |  FROM docs WHERE len(ts) >= $ShingleK),
       |fps AS (
       |  SELECT DISTINCT doc_id, fp
       |  FROM (
       |    SELECT doc_id, UNNEST(
       |      list_transform(range(1, greatest(len(hs) - $WindowW, 0) + 2),
       |        i -> list_reduce(
       |          list_prepend([CAST(-1 AS BIGINT), 9223372036854775807],
       |            list_transform(range(i, least(i + $WindowW, len(hs) + 1)),
       |              j -> [CAST(j AS BIGINT), hs[j]])),
       |          (acc, p) -> CASE WHEN p[2] <= acc[2] THEN p ELSE acc END)[2]))
       |      AS fp
       |    FROM hashed)),
       |keep AS (
       |  SELECT fp FROM fps GROUP BY fp
       |  HAVING COUNT(DISTINCT doc_id) <= $StopFpDf)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM fps a JOIN keep USING (fp) JOIN fps b USING (fp)
       |WHERE a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id
       |HAVING COUNT(*) >= $MinShared
       |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, Q] = Map("q377_winnowing" -> q377Winnowing)
  val oracleSql: Map[String, String] = Map("q377_winnowing" -> q377Sql)
}
