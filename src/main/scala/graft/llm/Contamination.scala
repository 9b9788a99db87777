package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Benchmark-contamination detection — the decontamination pass every
  * serious training pipeline runs before training: find corpus
  * documents that share word n-gram shingles with a held-out
  * evaluation set, so they can be dropped (training on eval text
  * inflates benchmark scores without real capability).
  *
  * The eval set here is the deterministic `doc_id % 97 = 0` slice of
  * the documents table standing in for an external benchmark suite;
  * shingles are word 3-grams (the q41 spelling — the fixture's
  * synthetic docs are short; production pipelines use 8–13-grams over
  * real text, which changes only the `sequence` bound).
  *
  * Scale shape — the reason this is cheap at 100 TB: benchmark suites
  * are small and FIXED (a few thousand docs) regardless of corpus
  * size, so the distinct eval-shingle set is broadcast; the corpus
  * side explodes map-only into the broadcast hash join and only
  * matching (train-doc, shingle, eval-doc) rows ever reach a shuffle
  * — the per-doc COUNT(DISTINCT) aggregation touches contaminated
  * docs only (~1/3 of docs here, typically ≪1% in production). The
  * corpus is never joined to itself.
  */
object Contamination {

  type Q = (SparkSession, String) => DataFrame

  /** q212 — per-document contamination report: every train-slice doc
    * sharing at least one 3-gram with the eval slice, with the number
    * of distinct contaminated shingles and of distinct eval docs hit.
    * Worst offenders first.
    */
  val q212Contamination: Q = (s, dir) => {
    implicit val sp: SparkSession = s
    import s.implicits._
    // the q41 shingle helper — one spelling of the 3-gram HOF repo-wide
    val grams = DedupQueries.triShingles(T.documents(s, dir))
    val eval = grams.filter($"doc_id" % 97 === 0)
      .select($"tg", $"doc_id".as("eval_doc"))
    val train = grams.filter($"doc_id" % 97 =!= 0)
    train.join(broadcast(eval), "tg")
      .groupBy($"doc_id")
      .agg(countDistinct($"tg").as("hits"),
        countDistinct($"eval_doc").as("eval_docs"))
      .orderBy($"hits".desc, $"doc_id")
  }

  val q212Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        UNNEST(list_transform(range(1, len(ws) - 1),
      |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tg
      |      FROM w),
      |ev AS (SELECT tg, doc_id AS eval_doc FROM g WHERE doc_id % 97 = 0)
      |SELECT g.doc_id,
      |  COUNT(DISTINCT g.tg) AS hits,
      |  COUNT(DISTINCT ev.eval_doc) AS eval_docs
      |FROM g JOIN ev ON g.tg = ev.tg
      |WHERE g.doc_id % 97 <> 0
      |GROUP BY g.doc_id
      |ORDER BY hits DESC, doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q212_contamination" -> q212Contamination,
  )

  val oracleSql: Map[String, String] = Map(
    "q212_contamination" -> q212Sql,
  )
}
