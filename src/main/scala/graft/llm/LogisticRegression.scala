package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Distributed full-batch logistic regression on hashed bag-of-words
  * features — the TRAINED quality/domain filter of the corpus pipeline
  * (the fastText-filter shape: CCNet, GPT-3's WebText classifier), and
  * the repo's first iteratively-FITTED linear model (q228's OLS is
  * closed-form; q277's isotonic is order-constrained). Binary target:
  * the q319 PLANTED LEXICAL CONCEPT (does 'join' out-count 'scan' by
  * ≥ the margin — the fixture's own lang labels are noise, measured),
  * so the gate has unambiguous ground truth at every SF and held-out
  * accuracy measures whether descent actually finds the marker
  * buckets through the hashing collisions.
  *
  * Fitting is gradient descent on the convex log-loss: T fixed
  * iterations, each ONE distributed pass — per-doc margin from a
  * broadcast weight ARRAY LITERAL (element_at on a 64-wide array — no
  * UDF, stays in codegen), then the per-bucket gradient partial-agg
  * whose result is the [[HashDim]]-bounded collect (the q140 BPE rule:
  * driver traffic is model-sized, never corpus-sized). Features are
  * the q296 signed hashing-trick projection (Weinberger et al.
  * ICML'09) L1-normalized per document.
  *
  * Oracle row is the q267/q277 gate convention — hashed columns are
  * data-derivable counts + `ok`, where `ok` folds: train loss
  * non-increasing across ALL iterations (convexity + small step — the
  * optimizer-is-actually-descending check), finite weights, and
  * held-out accuracy ≥ [[MinAccPermille]]‰ (majority baseline ~560‰).
  * Gates are coarse on purpose: double partial sums reorder under
  * partitioning, so ulp-level drift must not flip them.
  */
object LogisticRegression {

  type Q = (SparkSession, String) => DataFrame

  val HashDim = 64
  /** 20 iterations reach the same held-out accuracy as 30 at both
    * measured SFs (891/973‰) — the tail iterations only polish the
    * loss, and each one is a full distributed pass. */
  val Iters = 20
  val LearnRate = 3.5
  /** Pinned after measuring (sf0.001 891‰, sf0.01 973‰; chance ~500‰). */
  val MinAccPermille = 800L

  /** Everything the gate (and the spec/profiler) needs to inspect.
    * `scored` is the HELD-OUT (doc_id, y, p) frame — localCheckpointed,
    * so downstream consumers (q347 calibration) read it without
    * re-running the fit's lineage.
    */
  final case class Fit(nTrain: Long, nTest: Long, losses: Array[Double],
    weights: Array[Double], bias: Double, accPermille: Long,
    descentOk: Boolean, finiteOk: Boolean, scored: DataFrame,
    trainScored: DataFrame)

  /** The driver-side outcome of the iterative descent — everything in
    * [[Fit]] except the two scored frames. THIS is what gets memoized
    * per (session, dir): the fit is deterministic (md5 split, fixed
    * iterations, broadcast-literal weights), so its seven consumers
    * (q321, q347, q353, q376, q387, q398 + specs) share ONE descent
    * (~4.5 s each at sf0.1; ~25 s of redundant bench time before this
    * memo). The FRAMES are deliberately NOT cached: Verify/Bench
    * unpersist every block between queries, so a cached
    * localCheckpointed frame would be a dead block id — each fitEval
    * call instead re-derives scored/trainScored from the memoized
    * weights in one cheap pass (no iteration). Keyed on session
    * IDENTITY so a fresh session refits rather than trusting stale
    * state.
    */
  private final case class Model(nTrain: Long, nTest: Long,
    losses: Array[Double], weights: Array[Double], bias: Double,
    accPermille: Long, descentOk: Boolean, finiteOk: Boolean)

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Model]()

  def fitEval(s: SparkSession, dir: String): Fit = {
    import s.implicits._
    // Evict entries whose session has been stopped (spec suites spin
    // up several sessions per JVM; a strong key would pin each dead
    // SparkSession + Model forever).
    val it = modelCache.keySet.iterator()
    while (it.hasNext) { if (it.next()._1.sparkContext.isStopped) it.remove() }
    val m = modelCache.computeIfAbsent((s, dir), _ => fitModel(s, dir))
    val (docs, feats) = featureFrames(s, dir)
    val train = feats.filter($"doc_id" % 5 =!= 0)
    val test = feats.filter($"doc_id" % 5 === 0)
    val wCol = array(m.weights.toSeq.map(lit): _*)
    val b = m.bias
    val scoredDocs = test.groupBy($"doc_id", $"y")
      .agg(sum($"v" * element_at(wCol, $"bucket" + 1)).as("dot"))
    // held-out probabilities for downstream calibration (q347): the
    // sigmoid of the same margin the accuracy gate thresholds;
    // bias-only docs (every bucket lost to sign cancellation) score
    // sigmoid(b), same as the eval path in fitModel. `m` is the RAW
    // margin — the rank statistic q434's DeLong comparison quantizes
    // (sigmoid saturates to exactly 1.0 at large |margin|, which would
    // pool distinct ranks into one spurious tie class).
    val scored = scoredDocs
      .select($"doc_id", $"y", ($"dot" + lit(b)).as("m"),
        (lit(1.0) / (lit(1.0) + exp(-($"dot" + lit(b))))).as("p"))
      .unionByName(docs.filter($"doc_id" % 5 === 0)
        .join(scoredDocs.select($"doc_id"), Seq("doc_id"), "left_anti")
        .select($"doc_id", ($"lang" === "pro_join").cast("double").as("y"),
          lit(b).as("m"), lit(1.0 / (1.0 + math.exp(-b))).as("p")))
      .localCheckpoint()
    // TRAIN-side probabilities under the SAME final weights — the
    // frame an isotonic recalibrator (q353) fits on; bias-only train
    // docs handled identically to the test path
    val trainScoredDocs = train.groupBy($"doc_id", $"y")
      .agg(sum($"v" * element_at(wCol, $"bucket" + 1)).as("dot"))
    val trainScored = trainScoredDocs
      .select($"doc_id", $"y", ($"dot" + lit(b)).as("m"),
        (lit(1.0) / (lit(1.0) + exp(-($"dot" + lit(b))))).as("p"))
      .unionByName(docs.filter($"doc_id" % 5 =!= 0)
        .join(trainScoredDocs.select($"doc_id"), Seq("doc_id"), "left_anti")
        .select($"doc_id", ($"lang" === "pro_join").cast("double").as("y"),
          lit(b).as("m"), lit(1.0 / (1.0 + math.exp(-b))).as("p")))
      .localCheckpoint()
    Fit(m.nTrain, m.nTest, m.losses, m.weights, m.bias, m.accPermille,
      m.descentOk, m.finiteOk, scored, trainScored)
  }

  /** (docs, feats): the planted-label frame and the L2-normalized
    * signed-hash feature frame — one cheap non-iterative pass,
    * re-derived per call (see [[modelCache]] for why frames are never
    * cached across queries).
    */
  private def featureFrames(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    // Planted-concept labels (q319's frame: lang ∈ pro_join/pro_scan).
    val docs = NaiveBayes.plantedDocs(s, dir)

    // q296 signed feature hash, L1-normalized per doc, + the label.
    val tok = docs
      .select($"doc_id", ($"lang" === "pro_join").cast("double").as("y"),
        explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
      .select($"doc_id", $"y",
        conv(substring(md5($"tok"), 1, 4), 16, 10).cast("int").as("h"))
      .select($"doc_id", $"y", ($"h" % HashDim).cast("int").as("bucket"),
        when(expr(s"(h div $HashDim) % 2") === 0, 1.0)
          .otherwise(-1.0).as("sign"))
    // L2-normalize each doc's signed-count vector: ‖x‖₂ = 1 bounds the
    // log-loss curvature by ¼ (plus the bias row), so the fixed step
    // provably descends — L1 scaling under-conditioned the weights and
    // raw counts overshot on long docs (both measured as oscillation).
    val raw = tok.groupBy($"doc_id", $"y", $"bucket")
      .agg(sum($"sign").as("w"))
      .filter($"w" =!= 0.0)
    val norms = raw.groupBy($"doc_id")
      .agg(sqrt(sum($"w" * $"w")).as("nrm"))
    val feats = raw.join(norms, "doc_id")
      .select($"doc_id", $"y", $"bucket", ($"w" / $"nrm").as("v"))
    (docs, feats)
  }

  private def fitModel(s: SparkSession, dir: String): Model = {
    import s.implicits._
    val (docs, feats) = featureFrames(s, dir)
    val train = feats.filter($"doc_id" % 5 =!= 0).localCheckpoint()
    val test = feats.filter($"doc_id" % 5 === 0).localCheckpoint()
    // Labeled docs always tokenize (they contain a marker token), so
    // the split counts are plain planted-frame counts, as in the SQL.
    val nTrain = docs.filter($"doc_id" % 5 =!= 0).count()
    val nTest = docs.filter($"doc_id" % 5 === 0).count()

    var w = Array.fill(HashDim)(0.0)
    var b = 0.0
    val losses = Array.ofDim[Double](Iters)
    for (t <- 0 until Iters) {
      val wCol = array(w.toSeq.map(lit): _*)
      // Pass 1: per-doc margin, probability, residual g = p − y; the
      // stable log-loss max(s,0) − y·s + ln(1+e^(−|s|)).
      val perDoc = train.groupBy($"doc_id", $"y")
        .agg(sum($"v" * element_at(wCol, $"bucket" + 1)).as("dot"))
        .withColumn("s", $"dot" + lit(b))
        .withColumn("g", lit(1.0) / (lit(1.0) + exp(-$"s")) - $"y")
        .withColumn("loss",
          greatest($"s", lit(0.0)) - $"y" * $"s" + log(lit(1.0) + exp(-abs($"s"))))
      val gframe = perDoc.select($"doc_id", $"g", $"loss").localCheckpoint()
      // Pass 2: per-bucket gradient, with the loss/bias totals riding
      // along as a sentinel bucket −1 — ONE HashDim+1-row collect per
      // iteration instead of separate loss and gradient jobs (the
      // 3-jobs-per-iteration spelling measured ~40% slower).
      val stats = train.join(gframe.select($"doc_id", $"g"), "doc_id")
        .groupBy($"bucket").agg(sum($"g" * $"v").as("a"), lit(0.0).as("b2"))
        .unionByName(gframe.agg(sum($"loss").as("a"), sum($"g").as("b2"))
          .select(lit(-1).as("bucket"), $"a", $"b2"))
        .as[(Int, Double, Double)].collect()
      val grad = stats.filter(_._1 >= 0).map(r => (r._1, r._2)).toMap
      val (lossSum, gBias) = stats.find(_._1 == -1)
        .map(r => (r._2, r._3)).get
      losses(t) = lossSum / nTrain
      w = w.zipWithIndex.map { case (wi, i) =>
        wi - LearnRate * grad.getOrElse(i, 0.0) / nTrain
      }
      b = b - LearnRate * gBias / nTrain
    }

    val descentOk = (1 until Iters).forall(t =>
      losses(t) <= losses(t - 1) * (1 + 1e-9) + 1e-9)
    val finiteOk = w.forall(x => !x.isNaN && !x.isInfinite) &&
      !b.isNaN && !b.isInfinite

    val wCol = array(w.toSeq.map(lit): _*)
    val scoredDocs = test.groupBy($"doc_id", $"y")
      .agg(sum($"v" * element_at(wCol, $"bucket" + 1)).as("dot"))
      .withColumn("pred", ($"dot" + lit(b) > 0.0).cast("double"))
    val evalRow = scoredDocs.agg(
      count(lit(1)).as("n"),
      sum(when($"pred" === $"y", 1L).otherwise(0L)).as("n_correct")).head()
    // A labeled doc could in principle lose every bucket to sign
    // cancellation and never reach `feats`; those score by bias alone.
    val nEmpty = nTest - evalRow.getLong(0)
    val emptyCorrect =
      if (nEmpty == 0) 0L
      else docs.filter($"doc_id" % 5 === 0)
        .join(scoredDocs.select($"doc_id"), Seq("doc_id"), "left_anti")
        .filter((($"lang" === "pro_join").cast("double")
          === lit(if (b > 0) 1.0 else 0.0)))
        .count()
    val nCorrect = evalRow.getLong(1) + emptyCorrect
    val accPermille = if (nTest == 0) 0L else 1000L * nCorrect / nTest
    Model(nTrain, nTest, losses, w, b, accPermille, descentOk, finiteOk)
  }

  val q321LogregGate: Q = (s, dir) => {
    val f = fitEval(s, dir)
    val ok = f.descentOk && f.finiteOk && f.accPermille >= MinAccPermille
    s.createDataFrame(Seq(
      (f.nTrain, f.nTest, HashDim.toLong, ok)
    )).toDF("n_train", "n_test", "dim", "ok")
  }

  val q321Sql: String =
    s"""WITH planted AS (
       |  SELECT doc_id FROM (SELECT doc_id,
       |      (length(text) - length(replace(text, 'join', ''))) / 4 AS cj,
       |      (length(text) - length(replace(text, 'scan', ''))) / 4 AS cs
       |    FROM documents)
       |  WHERE abs(cj - cs) >= ${NaiveBayes.ConceptMargin})
       |SELECT
       |  (SELECT COUNT(*) FROM planted WHERE doc_id % 5 <> 0) AS n_train,
       |  (SELECT COUNT(*) FROM planted WHERE doc_id % 5 = 0) AS n_test,
       |  CAST($HashDim AS BIGINT) AS dim, TRUE AS ok""".stripMargin

  val queries: Map[String, Q] = Map("q321_logreg_gate" -> q321LogregGate)
  val oracleSql: Map[String, String] = Map("q321_logreg_gate" -> q321Sql)
}
