package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Corpus-construction operators beyond dedup/scoring: positional
  * phrase search, token-budget data mixing, and span-level duplication
  * profiling (the counting stage of exact-substring dedup).
  *
  * The reference has no text surface at all (it serves opaque file
  * bodies — main.go:300-333); these are north-star [N] rows from
  * SURVEY.md §2.b driven by what a 100 TB training-data pipeline needs.
  *
  * Scale shapes:
  *   - q135 builds a positional inverted index (doc_id, pos, token) but
  *     filters it to the query's terms BEFORE any shuffle — the postings
  *     join is on (doc_id, pos), so per-term posting lists meet in one
  *     equi-join, never an all-terms index materialization. A served
  *     system would persist the full index bucketed by token; the query
  *     plan over it is this same postings equi-join.
  *   - q136 is per-source curriculum sampling to a token budget: the
  *     only shuffle is hash-partitioning by source, the take-while is a
  *     per-partition cumulative sum inside a keyed window (bounded
  *     state, no global order), and selection is deterministic via a
  *     salted md5 so reruns and engines agree.
  *   - q139 profiles duplicated k-token spans. Spans are md5'd BEFORE
  *     the frequency shuffle, so the shuffled key is a constant-width
  *     32-hex digest, not a k-token string — the same key-narrowing the
  *     MinHash pipeline uses (DedupQueries.scala). Cross-doc frequency
  *     is one groupBy + one join back; both hash-partition on the
  *     digest.
  */
object CorpusOps {

  type Q = (SparkSession, String) => DataFrame

  /** q135 phrase — two adjacent whitespace tokens. */
  val PhraseFirst = "table"
  val PhraseSecond = "hash"

  /** q135 — positional-index phrase search: docs containing the exact
    * bigram phrase, with per-doc occurrence counts from an adjacency
    * join of the two terms' postings.
    */
  val q135PhraseSearch: Q = (s, dir) => {
    import s.implicits._
    val idx = T.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
    val t1 = idx.filter($"tok" === PhraseFirst).select($"doc_id", $"pos")
    val t2 = idx.filter($"tok" === PhraseSecond)
      .select($"doc_id", ($"pos" - 1).as("pos"))
    t1.join(t2, Seq("doc_id", "pos"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_occ"))
      .orderBy($"doc_id")
  }

  val q135Sql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id, COUNT(*) AS n_occ
       |FROM d, unnest(range(1, len(toks))) AS t(i)
       |WHERE toks[i] = '$PhraseFirst' AND toks[i + 1] = '$PhraseSecond'
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** q136 — per-source token budget (take-while over salted-md5 order). */
  val MixTokenBudget = 800L

  /** q136 — token-budget data mixing: within each source, take docs in
    * salted-md5 order while the cumulative token count stays within the
    * budget; emit per-source selected doc/token totals.
    */
  val q136TokenBudgetMix: Q = (s, dir) => {
    import s.implicits._
    val d = T.documents(s, dir).select(
      $"doc_id", $"source",
      size(split($"text", " ")).cast("long").as("n_tok"),
      md5(concat($"doc_id".cast("string"), lit(":mix"))).as("h"))
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    d.withColumn("cum", sum($"n_tok").over(w))
      .filter($"cum" <= MixTokenBudget)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .orderBy($"source")
  }

  val q136Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    md5(CAST(doc_id AS VARCHAR) || ':mix') AS h
       |  FROM documents),
       |c AS (
       |  SELECT source, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum
       |  FROM d)
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |FROM c WHERE cum <= $MixTokenBudget
       |GROUP BY source ORDER BY source""".stripMargin

  /** q139 — span length in whitespace tokens. */
  val SpanK = 8

  /** Span-duplication profile of a (doc_id, text) frame: per doc, the
    * number of k-token spans and how many of them occur in ≥2 distinct
    * docs. Docs shorter than k tokens carry no spans and are excluded.
    */
  def dupSpanProfile(docs: DataFrame, k: Int = SpanK): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = split($"text", " ")
    val spans = docs
      .filter(size(toks) >= k)
      .select($"doc_id",
        explode(transform(sequence(lit(1), size(toks) - (k - 1)),
          i => md5(concat_ws(" ", slice(toks, i, lit(k)))))).as("h"))
    val df = spans.groupBy($"h")
      .agg(countDistinct($"doc_id").as("span_df"))
    spans.join(df, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when($"span_df" >= 2, 1L).otherwise(0L)).as("n_dup"))
      .orderBy($"doc_id")
  }

  /** q139 — duplicate-span profiling (exact-substring-dedup counting
    * stage): every k-token span, md5'd; a span is "duplicated" when it
    * appears in ≥2 distinct docs; per doc, total spans vs duplicated
    * spans. Docs shorter than k tokens carry no spans and are excluded
    * symmetrically in both engines.
    */
  val q139DupSpans: Q = (s, dir) => dupSpanProfile(T.documents(s, dir))

  val q139Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= $SpanK),
       |sp AS (
       |  SELECT doc_id, md5(array_to_string(toks[i:i + ${SpanK - 1}], ' ')) AS h
       |  FROM d, unnest(range(1, len(toks) - ${SpanK - 2})) AS t(i)),
       |df AS (SELECT h, COUNT(DISTINCT doc_id) AS span_df FROM sp GROUP BY h)
       |SELECT sp.doc_id, COUNT(*) AS n_spans,
       |  CAST(SUM(CASE WHEN df.span_df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |FROM sp JOIN df USING (h)
       |GROUP BY sp.doc_id
       |ORDER BY sp.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q135_phrase_search" -> q135PhraseSearch,
    "q136_token_budget_mix" -> q136TokenBudgetMix,
    "q139_dup_spans" -> q139DupSpans,
  )

  val oracleSql: Map[String, String] = Map(
    "q135_phrase_search" -> q135Sql,
    "q136_token_budget_mix" -> q136Sql,
    "q139_dup_spans" -> q139Sql,
  )
}
