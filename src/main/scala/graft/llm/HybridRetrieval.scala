package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.functions.VectorFunctions._

/** HYBRID RETRIEVAL via reciprocal-rank fusion (Cormack, Clarke &
  * Buettcher SIGIR'09 — the fusion every modern RAG / search stack
  * ships: a lexical BM25 leg and a dense vector leg answer
  * independently, and only their RANKS are fused:
  * `rrf(d) = Σ_legs 1/(K + rank_leg(d))`, K = 60).
  *
  * Legs reuse the two existing retrieval surfaces verbatim:
  *   - lexical = q108's BM25 ([[TextPipeline.bm25]], identical
  *     stopword/term pinning) over `documents`;
  *   - dense = q44's quantized-dot cosine ([[dot_q20]], int64-exact,
  *     engine-order-independent) against the pinned query vector
  *     (`vec_id = `[[QueryVecId]]) over `embeddings` (doc_id ≡ vec_id).
  *
  * Each leg retrieves a BOUNDED top-[[LegK]] list (orderBy+limit ⟹
  * TakeOrdered — per-partition heaps, no global sort), ranks within
  * its own list, and the fusion is one [[LegK]]-row full-outer join:
  * a doc missing from a leg contributes 0, exactly the RRF paper's
  * treatment of unretrieved documents. All output values are BIGINT
  * (ranks + floor-divided rrf contributions in nano units), so the
  * row hash is float-free even though BM25 ran on doubles.
  *
  * Scale shape: the lexical leg is a postings aggregation (tokens
  * filtered to the query terms BEFORE the tf groupBy), the dense leg
  * broadcasts one query row and streams the corpus; both end in O(LegK)
  * per-partition heaps. The fusion itself never sees more than
  * 2·[[LegK]] rows regardless of corpus size.
  */
object HybridRetrieval {

  type Q = (SparkSession, String) => DataFrame

  /** Per-leg retrieval depth (the candidate lists being fused). */
  val LegK = 128
  /** RRF damping constant — the SIGIR'09 paper's k = 60. */
  val RrfK = 60L
  /** Final fused list size. */
  val FuseTop = 10
  /** Pinned dense-leg query: the corpus vector with this id. */
  val QueryVecId = 0L

  val q481HybridRrf: Q = (s, dir) => {
    import s.implicits._
    val docs = T.documents(s, dir)
    val n = docs.select(countDistinct($"doc_id")).as[Long].head()

    // lexical leg: q108 BM25, top-LegK (TakeOrdered, no global sort)
    val lexTop = TextPipeline.bm25(docs, TextPipeline.Bm25QueryTerms, n)
      .select($"doc_id", $"bm25")
      .orderBy($"bm25".desc, $"doc_id".asc).limit(LegK)
    val lexRank = lexTop.withColumn("r_lex", row_number()
        .over(Window.orderBy($"bm25".desc, $"doc_id".asc)).cast("long"))
      .select($"doc_id", $"r_lex")

    // dense leg: quantized-dot cosine vs the pinned query vector
    val e = T.embeddings(s, dir)
      .select($"vec_id", $"embedding", norm_q20($"embedding").as("nrm"))
    val qv = e.filter($"vec_id" === QueryVecId)
      .select($"embedding".as("qe"), $"nrm".as("qn"))
    val vecTop = e.crossJoin(broadcast(qv))
      .withColumn("cos_sim",
        cosine(dot_q20($"qe", $"embedding").cast("double"), $"qn", $"nrm"))
      .select($"vec_id".as("doc_id"), $"cos_sim")
      .orderBy($"cos_sim".desc, $"doc_id".asc).limit(LegK)
    val vecRank = vecTop.withColumn("r_vec", row_number()
        .over(Window.orderBy($"cos_sim".desc, $"doc_id".asc)).cast("long"))
      .select($"doc_id", $"r_vec")

    // fusion: 2·LegK rows, unretrieved leg contributes 0
    val fused = lexRank.join(vecRank, Seq("doc_id"), "full_outer")
      .withColumn("c_lex", when($"r_lex".isNotNull,
        expr(s"CAST(1000000000 AS BIGINT) div (${RrfK}L + r_lex)"))
        .otherwise(lit(0L)))
      .withColumn("c_vec", when($"r_vec".isNotNull,
        expr(s"CAST(1000000000 AS BIGINT) div (${RrfK}L + r_vec)"))
        .otherwise(lit(0L)))
      .withColumn("rrf_nano", $"c_lex" + $"c_vec")
      .withColumn("r_lex", coalesce($"r_lex", lit(0L)))
      .withColumn("r_vec", coalesce($"r_vec", lit(0L)))
    fused
      .orderBy($"rrf_nano".desc, $"doc_id".asc).limit(FuseTop)
      .withColumn("rank", row_number()
        .over(Window.orderBy($"rrf_nano".desc, $"doc_id".asc)).cast("long"))
      .select($"rank", $"doc_id", $"r_lex", $"r_vec", $"rrf_nano")
      .orderBy($"rank")
  }

  val q481Sql: String = {
    val base = TextPipeline.q108Sql.replace("ORDER BY 1", "")
    s"""WITH b AS ($base),
      |lex AS (
      |  SELECT doc_id, bm25 FROM b
      |  ORDER BY bm25 DESC, doc_id LIMIT $LegK),
      |lexr AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
      |  FROM lex),
      |qe AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |nrm AS (
      |  SELECT vec_id, SQRT(CAST(SUM(qv[i] * qv[i]) AS DOUBLE)) AS nrm
      |  FROM qe, range(1, 65) t(i) GROUP BY vec_id),
      |dots AS (
      |  SELECT b.vec_id AS doc_id, CAST(SUM(a.qv[i] * b.qv[i]) AS DOUBLE) AS dot
      |  FROM qe a JOIN qe b ON a.vec_id = $QueryVecId, range(1, 65) t(i)
      |  GROUP BY 1),
      |vtop AS (
      |  SELECT doc_id, dot / (na.nrm * nb.nrm) AS cos_sim
      |  FROM dots JOIN nrm na ON na.vec_id = $QueryVecId
      |            JOIN nrm nb ON dots.doc_id = nb.vec_id
      |  ORDER BY cos_sim DESC, doc_id LIMIT $LegK),
      |vr AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS r_vec
      |  FROM vtop),
      |fuse AS (
      |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
      |    COALESCE(l.r_lex, 0) AS r_lex, COALESCE(v.r_vec, 0) AS r_vec,
      |    (CASE WHEN l.r_lex IS NULL THEN 0
      |          ELSE CAST(1000000000 AS BIGINT) // ($RrfK + l.r_lex) END)
      |    + (CASE WHEN v.r_vec IS NULL THEN 0
      |            ELSE CAST(1000000000 AS BIGINT) // ($RrfK + v.r_vec) END)
      |      AS rrf_nano
      |  FROM lexr l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id)
      |SELECT ROW_NUMBER() OVER (ORDER BY rrf_nano DESC, doc_id) AS rank,
      |  doc_id, r_lex, r_vec, rrf_nano
      |FROM fuse
      |ORDER BY rrf_nano DESC, doc_id LIMIT $FuseTop""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q481_hybrid_rrf" -> q481HybridRrf)
  val oracleSql: Map[String, String] = Map(
    "q481_hybrid_rrf" -> q481Sql)
}
