package graft.relational

import graft.SparkSpec

/** Semantic gates for the inference rows (q228-q230): the oracle proves
  * cross-engine equality; these prove the STATISTICS mean what they
  * claim on known inputs — a regression recovers a planted line, Welch
  * collapses to ~0 on an identical-split metric, chi-square is zero on
  * an exactly independent grid.
  */
class StatInferenceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q228 recovers an exact planted line (slope 3) and sane fixture fit") {
    // y = 3x + 7 exactly: the closed form must return the slope bit-exactly
    val s = (1 to 100).map(x => (x.toLong, 3L * x + 7))
      .toDF("qx", "qy")
      .selectExpr("COUNT(*) AS n", "SUM(qx) AS sx", "SUM(qy) AS sy",
        "SUM(qx*qx) AS sxx", "SUM(qx*qy) AS sxy")
      .selectExpr("(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) AS slope")
      .head().getDouble(0)
    assert(s == 3.0, s"planted slope must be exactly 3.0, got $s")
    val fix = StatInference.q228GroupedOls(spark, dir).collect()
    assert(fix.length == 3)
    fix.foreach { r =>
      val (slope, r2) = (r.getAs[Double]("slope"), r.getAs[Double]("r2"))
      // the synthetic fixture draws price independent of quantity, so
      // the slope is near-zero noise — assert well-formedness, not sign
      assert(!slope.isNaN && !slope.isInfinite, s"slope not finite: $slope")
      assert(r2 >= 0 && r2 <= 1, s"r2 out of [0,1]: $r2")
    }
  }

  test("q229 t-stat is finite and variants are near-balanced") {
    val rows = StatInference.q229WelchTtest(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val t = r.getAs[Double]("t_stat")
      assert(na > 0 && nb > 0, "both variants populated")
      assert(!t.isNaN && !t.isInfinite, s"t_stat must be finite: $t")
      // a hash split of a shared distribution should not show a huge t
      assert(math.abs(t) < 10, s"|t| implausibly large for a null split: $t")
    }
  }

  test("q230 chi2 is zero on an exactly independent contingency") {
    // 2 langs x 2 sources, counts exactly proportional -> chi2 == 0
    val docs = Seq.tabulate(60) { i =>
      val lang = if (i % 3 == 0) "aa" else "bb"  // 20 / 40
      val source = if (i % 2 == 0) "s0" else "s1" // independent of lang?
      (i.toLong, s"t$i", lang, source, 1L)
    }
    // i%3 and i%2 over 0..59 are exactly independent (period 6 covers
    // all combos uniformly: lcm(2,3)=6 divides 60)
    val d = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    val obs = d.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(obs(("aa", "s0")) * obs(("bb", "s1")) ==
      obs(("aa", "s1")) * obs(("bb", "s0")), "planted grid independent")
    // chi2 of the planted grid via the same quantized-term arithmetic
    d.createOrReplaceTempView("planted_docs")
    val planted = spark.sql(
      """WITH obs AS (SELECT lang, source, COUNT(*) AS o FROM planted_docs GROUP BY lang, source),
        |rowt AS (SELECT lang, COUNT(*) AS rt FROM planted_docs GROUP BY lang),
        |colt AS (SELECT source, COUNT(*) AS ct FROM planted_docs GROUP BY source),
        |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM planted_docs)
        |SELECT SUM(CAST(FLOOR(1000000.0 * ((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/n) * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/n) / (CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/n))) AS BIGINT)) AS chi2_q
        |FROM rowt CROSS JOIN colt
        |LEFT JOIN obs ON obs.lang = rowt.lang AND obs.source = colt.source
        |CROSS JOIN tot""".stripMargin).head().getLong(0)
    assert(planted == 0L, s"independent grid must give chi2_q 0, got $planted")
    val fix = StatInference.q230Chi2Independence(spark, dir).head()
    assert(fix.getAs[Long]("n_cells") > 0)
    assert(fix.getAs[Long]("df") > 0)
    assert(fix.getAs[Long]("chi2_q") >= 0, "chi2 is non-negative")
  }

  test("q454 jackknife acceleration reduction is the textbook formula") {
    // the code computes a from Σẽ³/(6(Σẽ²)^1.5); verify against the
    // direct Efron definition Σ(θ̄₍·₎−θ₍ᵢ₎)³ / (6[Σ(θ̄₍·₎−θ₍ᵢ₎)²]^1.5)
    // on a small skewed sample — the n(n−1) cancellation is the
    // non-obvious step the oracle relies on
    val y = Array(1.0, 2.0, 2.0, 3.0, 7.0, 11.0, 30.0)
    val n = y.length
    val t = y.sum
    val jack = y.map(v => (t - v) / (n - 1))
    val jbar = jack.sum / n
    val d2 = jack.map(j => (jbar - j) * (jbar - j)).sum
    val d3 = jack.map(j => math.pow(jbar - j, 3)).sum
    val aDirect = d3 / (6.0 * math.pow(d2, 1.5))
    // jbar − θ₍ᵢ₎ = ẽᵢ/(n−1), so the (n−1) powers cancel in the ratio
    val e = y.map(_ - t / n)
    val aReduced = e.map(v => v * v * v).sum /
      (6.0 * math.pow(e.map(v => v * v).sum, 1.5))
    assert(math.abs(aDirect - aReduced) < 1e-12,
      s"reduction mismatch: direct $aDirect vs reduced $aReduced")
  }

  test("q458 theil-sen recovers a planted line through one wild outlier") {
    import spark.implicits._
    // r = 3d + 5 exactly, plus one corrupted day: the pairwise-slope
    // median must still read slope 3 / intercept 5 (micro-scaled) —
    // the breakdown property OLS lacks
    val clean = (0L until 10L).map(d => (d, 3L * d + 5L))
    val days = (clean :+ ((100L, 1000000000L))).toDF("d", "r")
    val (nDays, nPairs, slope, intercept) = StatInference.theilSenOn(days)
    assert(nDays == 11L && nPairs == 55L)
    assert(slope == 3000000L, s"robust slope: got $slope")
    assert(intercept == 5000000L, s"robust intercept: got $intercept")
  }

  test("q460 RM3 expansion reranks with a wider term set at sf0.001") {
    val rows = graft.llm.TextPipeline.q460Rm3Feedback(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= graft.llm.TextPipeline.QlTake)
    val hitMax = rows.map(_.getAs[Long]("n_terms_hit")).max
    info(s"rows=${rows.length} max n_terms_hit=$hitMax")
    // expansion must widen the matchable set past the raw query size
    assert(hitMax > graft.llm.TextPipeline.Bm25Query.size,
      "some doc must hit an expansion term beyond the original query")
  }

  test("q454 fixture gate: BCa interval brackets the mean at sf0.001") {
    val row = StatInference.q454BcaBootstrap(spark, dir).head()
    info(row.toString)
    assert(row.getAs[Long]("n") > 0)
    assert(row.getAs[Boolean]("ok"),
      "finite z0, ordered indices, interval must bracket theta-hat")
    assert(row.getAs[Double]("lo_mean") < row.getAs[Double]("hi_mean"))
  }
}
