package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** WORD2VEC TRAINING-DATA PREP (Mikolov et al. NIPS'13) — the two
  * artifacts an embedding trainer consumes, as data ops:
  *
  *   - q488 SKIP-GRAM PAIRS: every (center, context) token pair within
  *     a ±[[SgWindow]] position window inside a document, counted
  *     corpus-wide. Distinct from q252's ADJACENT-bigram PMI and
  *     q143's Kneser–Ney pair counts — the skip window is what makes
  *     word2vec's context distributional. Positions index the raw
  *     space-split array (empties filtered AFTER positioning), so both
  *     engines window over identical coordinates.
  *
  *   - q489 NEGATIVE-SAMPLING TABLE: the unigram^(3/4) proposal
  *     distribution. The fractional power is computed as
  *     `sqrt(cnt·sqrt(cnt))` — sqrt is IEEE correctly-rounded, `pow`
  *     is NOT, so this spelling (unlike POWER(cnt, 0.75)) is
  *     bit-identical across engines. Each weight is then
  *     micro-floored to BIGINT, the normalizer is an exact integer
  *     sum, and the emitted cumulative ppm column IS the inverse-CDF
  *     sampling table (bucket a uniform draw into [cum−p, cum)).
  *
  * Scale shape: q488's pair generation is a per-document band
  * self-join keyed on doc_id (per-group width bounded by document
  * length — the flatMapGroups admission rule; an array-local HOF
  * emitting the pairs inside one projection is the zero-shuffle
  * spelling) followed by one (center, context) partial agg. q489 is
  * one unigram agg + one vocabulary-bounded window (the cumulative
  * runs over DISTINCT terms, never the corpus).
  */
object Word2vecPrep {

  type Q = (SparkSession, String) => DataFrame

  /** Skip-gram window: |pos_center − pos_context| ≤ 2, ≠ 0. */
  val SgWindow = 2
  /** Reported head of the pair census. */
  val SgTop = 50
  /** Reported head of the sampling table. */
  val NegTop = 20

  /** (doc_id, i, term) — raw-array positions, empties dropped after. */
  private def positions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T.documents(s, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("i", "term")))
      .filter($"term" =!= "")
  }

  val q488SkipGrams: Q = (s, dir) => {
    import s.implicits._
    val pos = positions(s, dir)
    val ctx = pos.select($"doc_id", $"i".as("j"), $"term".as("context"))
    pos.join(ctx, "doc_id")
      .filter($"i" =!= $"j" && abs($"i" - $"j") <= SgWindow)
      .groupBy($"term".as("center"), $"context")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"center", $"context")
      .limit(SgTop)
  }

  val q488Sql: String =
    s"""WITH pos AS (
      |  SELECT doc_id, i, term FROM (
      |    SELECT doc_id, UNNEST(list_transform(string_split(text, ' '),
      |      (x, i) -> {'term': x, 'i': i}), recursive := true)
      |    FROM documents)
      |  WHERE term <> ''),
      |pairs AS (
      |  SELECT a.term AS center, b.term AS context
      |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
      |    AND a.i <> b.i AND ABS(a.i - b.i) <= $SgWindow)
      |SELECT center, context, COUNT(*) AS cnt
      |FROM pairs
      |GROUP BY 1, 2
      |ORDER BY cnt DESC, center, context
      |LIMIT $SgTop""".stripMargin

  val q489NegSampleTable: Q = (s, dir) => {
    import s.implicits._
    val uni = positions(s, dir).groupBy($"term")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w_micro",
        floor(lit(1000000.0) *
          sqrt($"cnt".cast("double") * sqrt($"cnt".cast("double"))))
          .cast("long"))
    val z = uni.agg(sum($"w_micro")).as[Long].head()
    val w = Window.orderBy($"w_micro".desc, $"term")
      .rowsBetween(Window.unboundedPreceding, 0)
    // ppm (not ppb): 10⁶·cum_micro ≤ 10⁶·Z stays inside int64 through
    // sf1 (Z ≈ 10¹²); ppb would overflow where cum approaches Z
    uni.withColumn("cum_micro", sum($"w_micro").over(w))
      .select($"term", $"cnt", $"w_micro",
        expr(s"1000000 * w_micro div ${z}L").as("prob_ppm"),
        expr(s"1000000 * cum_micro div ${z}L").as("cum_ppm"))
      .orderBy($"w_micro".desc, $"term")
      .limit(NegTop)
  }

  val q489Sql: String =
    s"""WITH pos AS (
      |  SELECT doc_id, i, term FROM (
      |    SELECT doc_id, UNNEST(list_transform(string_split(text, ' '),
      |      (x, i) -> {'term': x, 'i': i}), recursive := true)
      |    FROM documents)
      |  WHERE term <> ''),
      |uni AS (
      |  SELECT term, COUNT(*) AS cnt,
      |    CAST(FLOOR(1000000.0 *
      |      SQRT(CAST(COUNT(*) AS DOUBLE) * SQRT(CAST(COUNT(*) AS DOUBLE))))
      |      AS BIGINT) AS w_micro
      |  FROM pos GROUP BY 1),
      |z AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS z FROM uni),
      |cum AS (
      |  SELECT term, cnt, w_micro,
      |    CAST(SUM(w_micro) OVER (ORDER BY w_micro DESC, term
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_micro
      |  FROM uni)
      |SELECT term, cnt, w_micro,
      |  1000000 * w_micro // (SELECT z FROM z) AS prob_ppm,
      |  1000000 * cum_micro // (SELECT z FROM z) AS cum_ppm
      |FROM cum
      |ORDER BY w_micro DESC, term
      |LIMIT $NegTop""".stripMargin

  val queries: Map[String, Q] = Map(
    "q488_skipgram_pairs" -> q488SkipGrams,
    "q489_negsample_table" -> q489NegSampleTable)
  val oracleSql: Map[String, String] = Map(
    "q488_skipgram_pairs" -> q488Sql,
    "q489_negsample_table" -> q489Sql)
}
