package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** BIGRAM-LM PERPLEXITY document scoring — the CCNet quality filter
  * (Wenzek et al. LREC'20 §3: score every document by the
  * cross-entropy a language model assigns it, keep the low-perplexity
  * head / flag the tail; also Gopher's fluency signal, Rae et al.
  * 2021 §A1.2). The single most-used corpus-curation score next to
  * the repetition metrics (q126) and the classifier-based filters
  * (q434 NB, q216 DSIR): repetition catches degenerate structure,
  * DSIR measures domain match, perplexity measures FLUENCY under a
  * reference LM. Here the reference LM is a bigram model with add-one
  * smoothing fit on the q95 train split (md5-bucket < 80), and every
  * document — train and held-out alike — gets its cross-entropy and
  * the keep/flag verdict (CCNet scores the full corpus with an LM
  * trained on the reference subset; unseen held-out tokens enter as
  * a reserved OOV class whose label contains the split delimiter, so
  * it can never collide with a real token).
  *
  * Exactness (the q341/q108 discipline, extended to a transcendental):
  * all counts (c₂(w₁w₂), c₁(w₁·), V) are exact BIGINTs off one pass;
  * the per-bigram-type weight ⌊10⁶·ln((c₁+V)/(c₂+1))⌋ quantizes to a
  * BIGINT micro-nat ONCE per TYPE (the q434 convention), so every
  * per-doc score is an order-free exact integer sum; the emitted
  * cross-entropy finishes as ONE shared division of exact integers
  * (correctly-rounded IEEE); the keep verdict is an exact integer
  * cross-multiplication h_q ≤ τ·n_bigrams — never a float compare.
  * The LN argument is a correctly-rounded double ratio of exact
  * BIGINTs (identical cross-engine); LN itself is the one
  * sub-ulp-accurate (not correctly-rounded) step, so the spec MEASURES
  * the fixture weights' distance to the floor boundary (measured
  * 1.19·10⁻³ at sf0.001, gated ≥ 10⁻⁶, vs ~3·10⁻⁹ for a 1-ulp libm
  * disagreement) — near-boundary weights
  * at other corpora can differ by one micro-nat between libms, which
  * is inside the quantization error the score already carries.
  *
  * Scale shape: tokenization is one corpus-linear explode; the count
  * tables and vocab are vocab-bounded aggs; the weight table is built
  * once per distinct CORPUS bigram type (left joins to the count
  * tables — types absent from train get the c₂ = 0 / c₁ = 0 smoothed
  * weight); scoring is one equi-join of the corpus bigram-type stream
  * against the weight table and one per-doc partial agg. No window
  * over the corpus, no broadcast of corpus-sized state, nothing
  * quadratic.
  */
object LmPerplexity {

  type Q = (SparkSession, String) => DataFrame

  /** Micro-nat quantization scale for the per-bigram weight. */
  val LmScale = 1000000L

  /** The reserved OOV class label. It contains the tokenizer's split
    * delimiter (a space), so NO corpus token can ever equal it —
    * a train document that literally contains the string "<unk>"
    * lands in vocab as an ordinary type and can never collide with
    * (and silently absorb the smoothing of) the OOV class (r16 advice:
    * the old bare "<unk>" sentinel conflated the two; both engines did
    * it identically, so only the modeling was skewed, never the
    * oracle compare).
    */
  val UnkSentinel = "< unk >"

  /** Keep/flag threshold, micro-nats per bigram: documents with
    * h_q > τ·n_bigrams (cross-entropy above τ nats/token) are flagged.
    * Pinned inside the fixture's spread — measured ce ∈ [3.24, 3.64]
    * at sf0.001 and [3.28, 3.67] at sf0.01, median ≈ 3.39 at both —
    * so 3.45 splits keep/flag non-trivially at every SF.
    */
  val CeFlagMicroNats = 3450000L

  /** q95's engine-independent md5 train bucket (TextPipeline.trainSplit
    * spelling, shared with the oracle verbatim via CONV/'0x' forms).
    */
  private val TrainPct = 80

  val q569LmPerplexity: Q = (s, dir) =>
    lmPerplexity(T.documents(s, dir).select("doc_id", "lang", "text"))

  /** Bigram-LM cross-entropy per document over a `(doc_id, lang,
    * text)` frame: add-one-smoothed bigram weights fit on the md5
    * train split, exact micro-nat sums, keep/flag verdict.
    */
  def lmPerplexity(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val (sp, toks, vocab, bigStream, types) = pipeline(docs)
    val scored = bigStream.join(
        types.select($"w1", $"w2", $"w_q"), Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"w_q").as("h_q"))
    val oovPerDoc = toks
      .select($"doc_id", explode($"ts").as("w"))
      .join(vocab.withColumn("known", lit(true)), Seq("w"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"known", 0L).otherwise(1L)).as("n_oov"))
    sp.select($"doc_id", $"lang", $"is_train")
      .join(oovPerDoc, Seq("doc_id"))
      .join(scored, Seq("doc_id"))
      .withColumn("ce_nats", expr(CeFormula))
      .withColumn("keep", expr(KeepFormula))
      .select($"doc_id", $"lang", $"is_train", $"n_tokens", $"n_oov",
        $"n_bigrams", $"h_q", $"ce_nats", $"keep")
      .orderBy($"doc_id")
  }

  /** The per-bigram-type weight table `(w1, w2, w_raw, w_q)` with the
    * PRE-floor value exposed — the spec measures every fixture
    * weight's distance to the floor boundary (the libm-agreement
    * margin argued in the scaladoc).
    */
  def bigramWeightTable(docs: DataFrame): DataFrame = {
    val (_, _, _, _, types) = pipeline(docs)
    types.select(col("w1"), col("w2"), col("w_raw"), col("w_q"))
  }

  /** (sp, toks — checkpointed, train vocab, OOV-mapped bigram stream,
    * weight table): the token frame materializes ONCE and feeds the
    * training counts, the corpus bigrams AND the per-doc OOV census —
    * no second tokenize pass over the corpus.
    */
  private def pipeline(docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val s = docs.sparkSession
    import s.implicits._
    val sp = docs.withColumn("bucket",
      (conv(substring(md5($"doc_id".cast("string")), 1, 4), 16, 10)
        .cast("long") % 100))
      .withColumn("is_train", $"bucket" < TrainPct)
    val toks = sp.select($"doc_id", $"is_train",
      split($"text", " ").as("ts"))
      .localCheckpoint()
    // train-side statistics: bigram counts, context counts, vocab
    val trainBig = toks.filter($"is_train")
      .select(explode(expr(
        """transform(slice(ts, 1, size(ts) - 1),
          |  (x, i) -> struct(x AS w1, element_at(ts, i + 2) AS w2))"""
          .stripMargin)).as("b"))
      .select($"b.w1", $"b.w2")
    val c2 = trainBig.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val c1 = trainBig.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val vocab = toks.filter($"is_train")
      .select(explode($"ts").as("w")).distinct()
    // V = |train vocab| + 1: the +1 is the reserved OOV class every
    // out-of-vocabulary held-out token maps to
    val vRow = vocab.agg((count(lit(1)) + 1L).as("v"))
    // corpus bigram stream with OOV mapping (train tokens map to
    // themselves — the vocab left joins ARE the membership tests; the
    // bigrams come off the token array per doc, no positional
    // self-join)
    val corpusBig = toks
      .select($"doc_id", explode(expr(
        """transform(slice(ts, 1, size(ts) - 1),
          |  (x, i) -> struct(x AS w1, element_at(ts, i + 2) AS w2))"""
          .stripMargin)).as("b"))
      .select($"doc_id", $"b.w1".as("rw1"), $"b.w2".as("rw2"))
    val bigStream = corpusBig
      .join(vocab.select($"w".as("rw1"), lit(true).as("k1")),
        Seq("rw1"), "left")
      .join(vocab.select($"w".as("rw2"), lit(true).as("k2")),
        Seq("rw2"), "left")
      .select($"doc_id",
        when($"k1", $"rw1").otherwise(lit(UnkSentinel)).as("w1"),
        when($"k2", $"rw2").otherwise(lit(UnkSentinel)).as("w2"))
    // weight table: once per distinct corpus bigram TYPE — the one LN
    // per type, immediately quantized (q434 discipline); w_raw (the
    // pre-floor value) is kept for the spec's boundary measurement
    val types = bigStream.select($"w1", $"w2").distinct()
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vRow))
      .withColumn("w_raw", expr(
        s"""$LmScale.0 * LN(
           |  CAST(coalesce(c1, 0L) + v AS DOUBLE)
           |  / CAST(coalesce(c2, 0L) + 1L AS DOUBLE))""".stripMargin))
      .withColumn("w_q", expr("CAST(FLOOR(w_raw) AS BIGINT)"))
    (sp, toks, vocab, bigStream, types)
  }

  /** Cross-entropy, nats per bigram — shared verbatim; exact-int
    * inputs, one correctly-rounded division chain.
    */
  val CeFormula: String =
    s"CAST(h_q AS DOUBLE) / ($LmScale.0 * CAST(n_bigrams AS DOUBLE))"

  /** Keep verdict by exact integer cross-multiplication — no float
    * compare anywhere near the threshold.
    */
  val KeepFormula: String =
    s"h_q <= $CeFlagMicroNats * n_bigrams"

  val q569Sql: String =
    s"""WITH sp AS (
      |  SELECT doc_id, lang, text,
      |    (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      |      AS INTEGER) % 100) < $TrainPct AS is_train,
      |    string_split(text, ' ') AS ts
      |  FROM documents),
      |trainbig AS (
      |  SELECT ts[i] AS w1, ts[i + 1] AS w2
      |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i
      |        FROM sp WHERE is_train) x),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM trainbig GROUP BY 1, 2),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM trainbig GROUP BY 1),
      |vocab AS (
      |  SELECT DISTINCT unnest(ts) AS w FROM sp WHERE is_train),
      |vrow AS (SELECT COUNT(*) + 1 AS v FROM vocab),
      |tok AS (
      |  SELECT doc_id,
      |    CASE WHEN v.w IS NOT NULL THEN 0 ELSE 1 END AS oov
      |  FROM (SELECT doc_id, unnest(ts) AS w FROM sp) x
      |  LEFT JOIN vocab v ON v.w = x.w),
      |rawbig AS (
      |  SELECT doc_id, ts[i] AS rw1, ts[i + 1] AS rw2
      |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
      |        FROM sp) x),
      |bigstream AS (
      |  SELECT doc_id,
      |    CASE WHEN v1.w IS NOT NULL THEN rw1 ELSE '$UnkSentinel' END AS w1,
      |    CASE WHEN v2.w IS NOT NULL THEN rw2 ELSE '$UnkSentinel' END AS w2
      |  FROM rawbig LEFT JOIN vocab v1 ON v1.w = rawbig.rw1
      |              LEFT JOIN vocab v2 ON v2.w = rawbig.rw2),
      |types AS (
      |  SELECT bs.w1, bs.w2,
      |    CAST(FLOOR($LmScale.0 * LN(
      |      CAST(COALESCE(c1.c1, 0) + v AS DOUBLE)
      |      / CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE))) AS BIGINT) AS w_q
      |  FROM (SELECT DISTINCT w1, w2 FROM bigstream) bs
      |  LEFT JOIN c2 ON bs.w1 = c2.w1 AND bs.w2 = c2.w2
      |  LEFT JOIN c1 ON bs.w1 = c1.w1
      |  CROSS JOIN vrow),
      |scored AS (
      |  SELECT bs.doc_id, COUNT(*) AS n_bigrams,
      |    CAST(SUM(w_q) AS BIGINT) AS h_q
      |  FROM bigstream bs JOIN types
      |    ON bs.w1 = types.w1 AND bs.w2 = types.w2
      |  GROUP BY 1),
      |oovd AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    CAST(SUM(oov) AS BIGINT) AS n_oov
      |  FROM tok GROUP BY 1)
      |SELECT sp.doc_id, sp.lang, sp.is_train, n_tokens, n_oov,
      |  n_bigrams, h_q, $CeFormula AS ce_nats, $KeepFormula AS keep
      |FROM sp JOIN oovd ON sp.doc_id = oovd.doc_id
      |        JOIN scored ON sp.doc_id = scored.doc_id
      |ORDER BY sp.doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q569_lm_perplexity" -> q569LmPerplexity)
  val oracleSql: Map[String, String] = Map(
    "q569_lm_perplexity" -> q569Sql)
}
