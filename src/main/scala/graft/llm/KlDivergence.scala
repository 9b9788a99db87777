package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** PER-GROUP KL DIVERGENCE from the corpus unigram distribution
  * (Kullback–Leibler Ann.Math.Stat'51; the corpus-BALANCE diagnostic
  * data-mixing work reads before setting source weights — Xie et al.
  * 2023 DoReMi §3 optimizes exactly these per-domain divergences, and
  * CCNet-style pipelines report them per language/source shard):
  * for every language g, D(p_g ‖ p_corpus) = Σ_w p_g(w)·ln(p_g(w)/
  * p(w)) over the shared vocabulary — how far each shard's token
  * distribution sits from the blend it will be mixed into. Completes
  * the divergence family next to PMI (q384), DSIR's ratio scores
  * (q216) and the per-doc LM perplexity (q569).
  *
  * Exactness (the q569 discipline): all counts are exact BIGINTs; the
  * per-(g, w) log-ratio argument is the EXACT integer rational
  * (c_g·N_all)/(c_all·N_g) evaluated as one correctly-rounded double
  * division chain, LN'd once per (g, w) TYPE and micro-floored to a
  * BIGINT (⌊10⁶·ln r⌋ — FLOOR on a possibly-negative double is
  * floor-toward−∞ in BOTH engines, unlike integer div); the group sum
  * Σ_w c_g(w)·w_q is then an order-free exact integer = 10⁶·N_g·D̂_g,
  * and kl_nats finishes as ONE shared division. The spec measures the
  * fixture weights' distance to the floor boundary (the q569 libm
  * margin argument — measured 1.63·10⁻³ vs ~3·10⁻⁹ 1-ulp drift).
  * c_g(w) ≤ c_all(w) always (the group is part of the corpus), so the
  * ratio is finite and positive — no NULLIF needed; zero-count terms
  * never appear (the weight table is built from OBSERVED (g, w)
  * pairs).
  *
  * Scale shape: one tokenize explode; the (g, w) and (w) count tables
  * are vocab-bounded partial aggs; the weight projection and the
  * per-group sum are one equi-join + one agg. Nothing quadratic, no
  * window, no broadcast of corpus-sized state.
  */
object KlDivergence {

  type Q = (SparkSession, String) => DataFrame

  /** Micro-nat quantization scale (the q569 constant). */
  val KlScale = 1000000L

  val q575KlDivergence: Q = (s, dir) =>
    klByGroup(T.documents(s, dir).select(col("lang").as("g"), col("text")))

  /** `(g, n_tokens, vocab_g, kl_q, kl_nats)` over a `(g, text)` frame. */
  def klByGroup(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val tok = docs.select($"g", explode(split($"text", " ")).as("w"))
    val cg = tok.groupBy($"g", $"w").agg(count(lit(1)).as("c_g"))
      .localCheckpoint()
    val call = cg.groupBy($"w").agg(sum($"c_g").as("c_all"))
    val ng = cg.groupBy($"g").agg(sum($"c_g").as("n_g"),
      count(lit(1)).as("vocab_g"))
    val nall = call.agg(sum($"c_all").as("n_all"))
    val weighted = cg.join(call, Seq("w"))
      .join(ng, Seq("g"))
      .crossJoin(broadcast(nall))
      .withColumn("w_raw", expr(
        s"""$KlScale.0 * LN(
           |  (CAST(c_g AS DOUBLE) * CAST(n_all AS DOUBLE))
           |  / (CAST(c_all AS DOUBLE) * CAST(n_g AS DOUBLE)))"""
          .stripMargin))
      .withColumn("w_q", expr("CAST(FLOOR(w_raw) AS BIGINT)"))
    weighted.groupBy($"g")
      .agg(first($"n_g").as("n_tokens"), first($"vocab_g").as("vocab_g"),
        sum($"c_g" * $"w_q").as("kl_q"))
      .withColumn("kl_nats", expr(KlFormula))
      .select($"g", $"n_tokens", $"vocab_g", $"kl_q", $"kl_nats")
      .orderBy($"g")
  }

  /** The weight table with the pre-floor value — the spec's boundary
    * measurement surface (q569 convention).
    */
  def klWeightTable(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    klByGroupInternalWeights(docs)
  }

  private def klByGroupInternalWeights(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val tok = docs.select($"g", explode(split($"text", " ")).as("w"))
    val cg = tok.groupBy($"g", $"w").agg(count(lit(1)).as("c_g"))
    val call = cg.groupBy($"w").agg(sum($"c_g").as("c_all"))
    val ng = cg.groupBy($"g").agg(sum($"c_g").as("n_g"))
    val nall = call.agg(sum($"c_all").as("n_all"))
    cg.join(call, Seq("w")).join(ng, Seq("g"))
      .crossJoin(broadcast(nall))
      .withColumn("w_raw", expr(
        s"""$KlScale.0 * LN(
           |  (CAST(c_g AS DOUBLE) * CAST(n_all AS DOUBLE))
           |  / (CAST(c_all AS DOUBLE) * CAST(n_g AS DOUBLE)))"""
          .stripMargin))
      .select($"g", $"w", $"w_raw")
  }

  /** Shared finish: nats = kl_q / (10⁶ · N_g). */
  val KlFormula: String =
    s"CAST(kl_q AS DOUBLE) / ($KlScale.0 * CAST(n_tokens AS DOUBLE))"

  val q575Sql: String =
    s"""WITH tok AS (
      |  SELECT lang AS g, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |cg AS (SELECT g, w, COUNT(*) AS c_g FROM tok GROUP BY 1, 2),
      |call_ AS (SELECT w, CAST(SUM(c_g) AS BIGINT) AS c_all
      |          FROM cg GROUP BY 1),
      |ng AS (SELECT g, CAST(SUM(c_g) AS BIGINT) AS n_g,
      |              COUNT(*) AS vocab_g FROM cg GROUP BY 1),
      |nall AS (SELECT CAST(SUM(c_all) AS BIGINT) AS n_all FROM call_),
      |wt AS (
      |  SELECT cg.g, cg.c_g, ng.n_g, ng.vocab_g,
      |    CAST(FLOOR($KlScale.0 * LN(
      |      (CAST(c_g AS DOUBLE) * CAST(n_all AS DOUBLE))
      |      / (CAST(c_all AS DOUBLE) * CAST(n_g AS DOUBLE))))
      |      AS BIGINT) AS w_q
      |  FROM cg JOIN call_ ON cg.w = call_.w
      |          JOIN ng ON cg.g = ng.g
      |          CROSS JOIN nall),
      |agg AS (
      |  SELECT g, MAX(n_g) AS n_tokens, MAX(vocab_g) AS vocab_g,
      |    CAST(SUM(c_g * w_q) AS BIGINT) AS kl_q
      |  FROM wt GROUP BY g)
      |SELECT g, n_tokens, vocab_g, kl_q, $KlFormula AS kl_nats
      |FROM agg ORDER BY g""".stripMargin

  val queries: Map[String, Q] = Map(
    "q575_kl_divergence" -> q575KlDivergence)
  val oracleSql: Map[String, String] = Map(
    "q575_kl_divergence" -> q575Sql)
}
