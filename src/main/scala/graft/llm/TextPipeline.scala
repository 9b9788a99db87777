package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Reusable tokenize → stopword-filter → term-weight pipeline over a
  * text corpus (SURVEY.md §2.b LLM row "tokenize/stopwords/TF-IDF") —
  * the feature-extraction stages a training-data pipeline chains before
  * dedup/quality filtering, each a pure `DataFrame => DataFrame`.
  *
  * Scale shape: tokenize is a narrow explode (linear); term frequency is
  * one groupBy on (doc, term) with map-side combine; document frequency
  * is one groupBy on term. The corpus-size scalar joins back as a
  * broadcast literal — no driver-side collect of anything non-scalar.
  *
  * Determinism: the IDF uses the log-free BM25-style rational
  * `(N - df + 0.5) / (df + 0.5)` rather than `ln(N/df)` — engines
  * differ in `ln` at the ulp level, while add/divide/multiply of
  * integer-derived doubles are IEEE-exact-rounded and thus bit-identical
  * in Spark and DuckDB (same rule as graft.core.dsl).
  */
object TextPipeline {

  type Q = (SparkSession, String) => DataFrame

  /** Default stopword list (matches the marker set used by the quality
    * and lang-id queries).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Whitespace-tokenize `textCol` into one (idCol, term) row per
    * token; empty tokens (from repeated separators) are dropped.
    */
  def tokenize(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")

  /** Remove stopwords from a (idCol, term) frame. The list is a literal
    * IN-filter — at scale a broadcast semi-join against a stopword table
    * is the same plan shape.
    */
  def removeStopwords(tokens: DataFrame,
      stopwords: Seq[String] = Stopwords): DataFrame =
    tokens.filter(!col("term").isin(stopwords: _*))

  /** Per-(doc, term) weights over the stopword-filtered token stream:
    * tf (count in doc), df (docs containing term), and the rational
    * BM25-style weight tf·(N − df + ½)/(df + ½). `nDocs` is the corpus
    * size N, passed as a literal (compute it once upstream).
    */
  def tfidf(docs: DataFrame, nDocs: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tokens = removeStopwords(tokenize(docs, idCol, textCol))
    val tf = tokens.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tokens.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))
    tf.join(df, "term")
      .withColumn("weight",
        col("tf").cast("double")
          * ((lit(nDocs).cast("double") - col("df") + 0.5)
            / (col("df").cast("double") + 0.5)))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("weight"))
  }

  /** Top-5 weighted terms per document — the tfidf pipeline plus the
    * per-group top-k idiom (row_number ≤ k after one shuffle on doc_id).
    */
  val q76Tfidf: Q = (s, dir) => {
    import s.implicits._
    val docs = T.documents(s, dir)
    val n = docs.select(countDistinct($"doc_id")).as[Long].head()
    val w = Window.partitionBy($"doc_id")
      .orderBy($"weight".desc, $"term".asc)
    tfidf(docs, n)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .orderBy($"doc_id", $"rnk")
  }

  val q76Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
      |filt AS (
      |  SELECT doc_id, term FROM tok
      |  WHERE term <> '' AND term NOT IN ('the', 'a', 'of', 'and', 'to')),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM filt GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM filt GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
      |w AS (
      |  SELECT doc_id, term, tf, df,
      |    CAST(tf AS DOUBLE) * ((CAST(n AS DOUBLE) - df + 0.5)
      |                          / (CAST(df AS DOUBLE) + 0.5)) AS weight
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tf, df, weight, rnk FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |            ORDER BY weight DESC, term ASC) AS rnk FROM w) t
      |WHERE rnk <= 5
      |ORDER BY doc_id, rnk""".stripMargin

  val queries: Map[String, Q] = Map("q76_tfidf" -> q76Tfidf)
  val oracleSql: Map[String, String] = Map("q76_tfidf" -> q76Sql)
}
