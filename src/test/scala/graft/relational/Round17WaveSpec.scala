package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 wave: the ExactDiv de-float discipline (q540/q354/q575/
  * q576), MaxSim late interaction (q578), equality deletes (q579).
  */
class Round17WaveSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------
  // ExactDiv — the shared integer-division finish
  // ---------------------------------------------------------------

  test("ExactDiv: microFloor matches hand pins on both signs and " +
      "both engines' division semantics (Spark div truncates like " +
      "DuckDB //)") {
    import spark.implicits._
    // floor(1e6·7/3) = 2333333, floor(1e6·(-7)/3) = -2333334 (true
    // floor, NOT the -2333333 truncation); exact divide stays exact
    val rows = Seq((7L, 3L), (-7L, 3L), (6L, 3L), (-6L, 3L))
      .toDF("numL", "denL")
      .select(expr("CAST(numL AS DECIMAL(38,0))").as("num"),
        expr("CAST(denL AS DECIMAL(38,0))").as("den"))
    val out = rows.select(
      expr("CAST(" +
        graft.core.ExactDiv.microFloor("num", "den", "div") +
        " AS BIGINT)").as("m"),
      expr("CAST(" +
        graft.core.ExactDiv.floorDiv("num", "den", "div") +
        " AS BIGINT)").as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((2333333L, 2L), (-2333334L, -3L),
      (2000000L, 2L), (-2000000L, -2L)), s"got $out")
  }

  test("ExactDiv: the digit-group identity survives 128-bit " +
      "operands a naive 1e6 multiply would overflow") {
    // num = 1.6e35, den = 4e34: 1e6·num = 1.6e41 > DECIMAL(38,0) max,
    // but the quotient is exactly 4e6 micro-units
    val wide = spark.sql(
      "SELECT CAST('160000000000000000000000000000000000' AS " +
        "DECIMAL(38,0)) AS num, " +
        "CAST('40000000000000000000000000000000000' AS " +
        "DECIMAL(38,0)) AS den")
    val m = wide.select(expr("CAST(" +
      graft.core.ExactDiv.microFloor("num", "den", "div") +
      " AS BIGINT)").as("m")).head().getLong(0)
    assert(m == 4000000L, s"wide-operand micro division gave $m")
  }

  // ---------------------------------------------------------------
  // q578 MaxSim
  // ---------------------------------------------------------------

  test("q578: hand 2-doc MaxSim — per-query-token argmax over doc " +
      "tokens, exact Q20 integer sums") {
    import spark.implicits._
    // doc 0 (vec_id 0-7): eight (1, 0) tokens; doc 1 (vec_id 8-15):
    // four (0.5, 0) + four (0, 1). Q20: 1 -> 1048576, 0.5 -> 524288.
    // maxsim(0 -> 1) = 8 · max(1048576·524288, 0) = 4398046511104
    // maxsim(1 -> 0) = 4·(524288·1048576) + 4·0   = 2199023255552
    val vecs = (0L until 16L).map { i =>
      val v: Array[Float] =
        if (i < 8L) Array(1.0f, 0.0f)
        else if (i < 12L) Array(0.5f, 0.0f)
        else Array(0.0f, 1.0f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val out = graft.llm.MaxSim.maxSim(vecs, graft.llm.MaxSim.MsTokK)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("did"), r.getAs[Long]("maxsim"))).toSeq
    assert(out == Seq((0L, 1, 1L, 4398046511104L),
      (1L, 1, 0L, 2199023255552L)), s"got $out")
  }

  test("q578: candidate-leg rerank is rank-parity with exact full " +
      "MaxSim scoring on the corpus (the late-interaction recall " +
      "measurement)") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, dir)
    val pruned = graft.llm.MaxSim.maxSim(emb, graft.llm.MaxSim.MsTokK)
      .select("qid", "rank", "did", "maxsim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val exact = graft.llm.MaxSim.maxSim(emb, Int.MaxValue)
      .select("qid", "rank", "did", "maxsim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val hit = (pruned intersect exact).size
    info(s"rank parity: $hit/${exact.size} (pruned=${pruned.size})")
    assert(exact.nonEmpty)
    // measured: the per-token K=16 candidate leg reproduces the exact
    // top-5 lists verbatim at sf0.001 AND sf0.01 (the centroid-sum
    // surrogate it replaced reached only 15/60); a regression in
    // either leg (token top-K, argmax ties, rank order) breaks this
    assert(pruned == exact,
      s"candidate leg lost rank parity: ${exact.size - hit} rows differ")
  }

  // ---------------------------------------------------------------
  // q579 equality deletes
  // ---------------------------------------------------------------

  test("q579: both delete kinds coexist in one scan — non-empty " +
      "overlap, and the merged view equals the logical complement") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, dir)
    val eqUsers = ev.filter($"event_type" === "error" &&
        $"user_id" % graft.sources.EqualityDeletes.EqKeyMod ===
          graft.sources.EqualityDeletes.EqKeyRem)
      .select($"user_id").distinct()
    // composition is actually exercised: some row is hit by BOTH the
    // position predicate and the equality key set
    val overlap = ev.join(eqUsers, Seq("user_id"), "left_semi")
      .filter($"event_id" % graft.sources.DeletionVectors.DeleteMod ===
        graft.sources.DeletionVectors.DeleteRem)
      .count()
    info(s"rows deleted by BOTH kinds: $overlap")
    assert(overlap > 0L, "fixture no longer exercises the overlap")
    // engine view vs the Spark-side logical complement (the DuckDB
    // oracle replays the same complement independently)
    val got = graft.sources.EqualityDeletes
      .q579EqualityDeletes(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = ev
      .filter($"event_id" % graft.sources.DeletionVectors.DeleteMod =!=
        graft.sources.DeletionVectors.DeleteRem)
      .join(eqUsers, Seq("user_id"), "left_anti")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got $got want $want")
  }

  // ---------------------------------------------------------------
  // q580 higher moments
  // ---------------------------------------------------------------

  test("q580: hand-pinned skewness/kurtosis — symmetric, skewed, " +
      "exact-rational and constant groups") {
    import spark.implicits._
    // a: symmetric [−15,−5,5,15] → β₂ = 1.64, β₁ = 0
    // b: [−1,−1,−1,3] → m₂=3 m₃=6 m₄=21 → β₁ = 36/27, β₂ = 21/9
    // c: [0,0,1] → β₁ = 0.5 EXACTLY (w=1 truncation loses nothing),
    //    β₂ = 1.5
    // d: constant → M2 = 0: var 0, skew/kurt NULL-degrade
    val in = (Seq(-15L, -5L, 5L, 15L).map(("a", _)) ++
      Seq(-1L, -1L, -1L, 3L).map(("b", _)) ++
      Seq(0L, 0L, 1L).map(("c", _)) ++
      Seq(5L, 5L).map(("d", _))).toDF("g", "y")
    val out = HigherMoments.moments(in)
      .select($"g", $"var_micro", $"skew_sign", $"skew_b1_micro",
        $"kurt_b2_micro")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(out == Seq(
      ("a", 125000000L, 0, 0L, 1640000L),
      ("b", 3000000L, 1, 1333333L, 2333333L),
      ("c", 222222L, 1, 500000L, 1500000L),
      ("d", 0L, 0, -1L, -1L)), s"got $out")
  }

  test("q580: the central-moment combinations are anchor-invariant " +
      "exact integers (M2/M3/M4 match the recentered definition)") {
    import spark.implicits._
    // same values under two different anchors must give identical
    // M2/M3/M4 (the combinations cancel the anchor exactly)
    val base = Seq(3L, 9L, 27L, 41L, 50L)
    val shifted = base.map(_ - 17L)
    def m(of: Seq[Long]) = HigherMoments
      .moments(of.map(("g", _)).toDF("g", "y"))
      .select($"m2_hi", $"m2_lo", $"m3_hi", $"m3_lo", $"m4_hi", $"m4_lo",
        $"skew_sign")
      .head()
    assert(m(base) == m(shifted), "anchor leaked into the moments")
  }

  // ---------------------------------------------------------------
  // q581 length-bucketed batching
  // ---------------------------------------------------------------

  test("q581: hand-pinned ledger on order-free fixtures (equal-length " +
      "bucket splits 4+1; mixed single batch pads to its max)") {
    import spark.implicits._
    // width 16, budget 64, 1 shard:
    // five len-10 docs → bucket 0, cap 4 → batches 4+1, zero waste
    // two docs len 20/25 → bucket 1, cap 2 → ONE batch padded 2·25
    val docs = ((1 to 5).map(i => (i.toLong, 10L)) ++
      Seq((6L, 20L), (7L, 25L))).toDF("doc_id", "len")
    val out = graft.llm.LengthBucketing.ledger(docs, 16, 64, 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(out == Seq(
      (0L, 5L, 2L, 50L, 50L, 0L, 0L),
      (1L, 2L, 1L, 45L, 50L, 5L, 100000L)), s"got $out")
  }

  test("q581: conservation on real docs, and bucketing strictly cuts " +
      "padding waste vs a single mixed bucket") {
    import spark.implicits._
    val lens = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("len"))
      .localCheckpoint()
    val total = lens.agg(count(lit(1)), sum($"len")).head()
    def ledgerTotals(width: Int) = graft.llm.LengthBucketing
      .ledger(lens, width, graft.llm.LengthBucketing.TokBudget,
        graft.llm.LengthBucketing.Shards)
      .agg(sum($"n_docs"), sum($"real_tokens"), sum($"padded_tokens"),
        sum($"waste_tokens")).head()
    val bucketed = ledgerTotals(graft.llm.LengthBucketing.BucketWidth)
    // every doc batched exactly once, real mass conserved
    assert(bucketed.getLong(0) == total.getLong(0))
    assert(bucketed.getLong(1) == total.getLong(1))
    // a single 128-wide bucket mixes lengths 10..99 into shared
    // batches: its waste fraction must strictly exceed the bucketed
    // plan's (the op's reason to exist) — exact cross-multiplication
    val mixed = ledgerTotals(128)
    assert(mixed.getLong(3) * bucketed.getLong(2) >
      bucketed.getLong(3) * mixed.getLong(2),
      s"bucketed waste ${bucketed.getLong(3)}/${bucketed.getLong(2)} not" +
        s" below mixed ${mixed.getLong(3)}/${mixed.getLong(2)}")
  }

  // ---------------------------------------------------------------
  // q582 BLEU
  // ---------------------------------------------------------------

  test("q582: textbook pair — clipped n-gram precisions, micro-LN " +
      "geometric mean and exact brevity penalty") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the cat sat on mat")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc1", "doc2")
    val r = graft.llm.BleuScore.bleu(pairs, docs).head()
    val got = (r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8), r.getLong(9), r.getLong(10), r.getLong(11),
      r.getLong(12), r.getLong(13))
    // m/t: 5/5, 3/4, 2/3, 1/2; lnp floors −287683/−405466/−693148;
    // ⌊−1386297/4⌋ = −346575; bp = ⌊10⁶·(5−6)/5⌋ = −200000
    assert(got == (5L, 6L, 5L, 5L, 3L, 4L, 2L, 3L, 1L, 2L,
      -200000L, -546575L), s"got $got")
  }

  test("q582: reference multiplicity CLIPS candidate repeats, and a " +
      "zero four-gram match NULL-degrades the score") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a a a")).toDF("doc_id", "text")
    val r = graft.llm.BleuScore
      .bleu(Seq((1L, 2L)).toDF("doc1", "doc2"), docs).head()
    // clipped m1 = min(3 candidate 'a', 1 reference 'a') = 1
    assert(r.getLong(4) == 1L && r.getLong(5) == 3L, "clipping broken")
    assert(r.getLong(6) == 0L, "m2 should be 0")
    assert(r.isNullAt(13), "any m_n = 0 must NULL the score")
  }

  // ---------------------------------------------------------------
  // q583 Wilcoxon signed-rank
  // ---------------------------------------------------------------

  test("q583: hand-pinned signed-rank tables — tie-free, all-tied, " +
      "and a significant all-positive group; zeros dropped") {
    import spark.implicits._
    // x: d = [1,−2,3,−4,5] → 2r̄ = 2,4,6,8,10; W2⁺ = 2+6+10 = 18,
    //    e2 = 15, var12 = 2·5·6·11 = 660 → none
    // y: d = [2,−2,2,2] all |d| tied → r2 = 5 each; W2⁺ = 15,
    //    e2 = 10, ties3 = 60, var12 = 360−60 = 300 → none
    // z: d = 1..10 all positive → W2⁺ = 110, e2 = 55,
    //    var12 = 4620; 120000·54² > 38416·4620 → greater
    // plus two d = 0 rows in x that must NOT count
    val diffs = (Seq(1L, -2L, 3L, -4L, 5L, 0L, 0L).map(("x", _)) ++
      Seq(2L, -2L, 2L, 2L).map(("y", _)) ++
      (1L to 10L).map(("z", _))).toDF("g", "d")
    val out = WilcoxonSignedRank.wilcoxon(diffs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSeq
    assert(out == Seq(
      ("x", 5L, 18L, 15L, 660L, "none"),
      ("y", 4L, 15L, 10L, 300L, "none"),
      ("z", 10L, 110L, 55L, 4620L, "greater")), s"got $out")
  }

  test("q583: an all-negative group reads 'less' (two-sided symmetry)") {
    import spark.implicits._
    val out = WilcoxonSignedRank
      .wilcoxon((1L to 10L).map(i => ("w", -i)).toDF("g", "d"))
      .head()
    assert(out.getLong(2) == 0L && out.getString(5) == "less",
      s"got $out")
  }

  // ---------------------------------------------------------------
  // q584 LAD regression
  // ---------------------------------------------------------------

  test("q584: hand fixture — exact LAD line through (1,10),(6,18) " +
      "beats OLS in absolute loss, every output integer-exact") {
    import spark.implicits._
    val series = Seq((1L, 10L), (2L, 2L), (3L, 14L), (4L, 7L),
      (5L, 26L), (6L, 18L)).map { case (t, x) => ("s", t, x) }
      .toDF("g", "t", "x")
    val r = LadRegression.lad(series).head()
    val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8))
    // brute-force (python, all 15 candidate lines): winner i=1 j=6,
    // slope 8/5, intercept 42/5, loss 139/5 = 27.8 — the OLS line
    // (slope 3) reads abs loss 32 on the same points
    assert(got == (1L, 6L, 8L, 5L, 42L, 139L, 1600000L, 27L),
      s"got $got")
  }

  test("q584: exact winner is unique per group and its cross-" +
      "multiplied loss is minimal over the whole candidate set " +
      "on the real series") {
    import spark.implicits._
    val series = graft.core.Tables.orders(spark, dir)
      .groupBy($"o_orderpriority".as("g"),
        ((year($"o_orderdate") - 1992) * 12 + month($"o_orderdate"))
          .cast("long").as("t"))
      .agg(sum(expr("CAST(FLOOR(100 * o_totalprice) AS BIGINT)")).as("x"))
      .localCheckpoint()
    val won = LadRegression.lad(series).collect()
    val nGroups = series.select($"g").distinct().count()
    assert(won.length == nGroups.toInt, "one winner per group required")
    // re-derive every candidate's exact loss and REQUIRE no candidate
    // anywhere beats its group's winner (the shortlist margin check —
    // the exact optimum must not hide past double-rank ShortK)
    val pts = series.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    won.foreach { w =>
      val g = w.getString(0)
      val (den0, loss0) = (BigInt(w.getLong(4)), BigInt(w.getLong(6)))
      val ps = pts(g).map(p => (p._2, p._3))
      for {
        (ti, xi) <- ps; (tj, xj) <- ps if ti < tj
      } {
        val den = tj - ti; val snum = xj - xi
        val inum = xi * den - snum * ti
        val loss = ps.map { case (t, x) =>
          (BigInt(x) * den - (BigInt(inum) + BigInt(snum) * t)).abs
        }.sum
        assert(loss * den0 >= loss0 * den,
          s"candidate ($ti,$tj) in $g beats the winner: " +
            s"$loss/$den < $loss0/$den0")
      }
    }
  }

  test("q586: τ=0.9 pinball weights pick the P90 envelope line on " +
      "the same fixture — every point on/below it, distinct from " +
      "the LAD winner") {
    import spark.implicits._
    val pts = Seq((1L, 10L), (2L, 2L), (3L, 14L), (4L, 7L),
      (5L, 26L), (6L, 18L))
    val series = pts.map { case (t, x) => ("s", t, x) }.toDF("g", "t", "x")
    val r = LadRegression.fit(series, 9, 1).head()
    val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7))
    // brute-force: winner (1,5), slope 16/4 = 4, intercept 24/4,
    // pinball×10 loss 172/4 = 43 — vs the LAD winner (1,6)
    assert(got == (1L, 5L, 16L, 4L, 24L, 172L, 4000000L), s"got $got")
    val (sn, dn, in) = (got._3, got._4, got._5)
    assert(pts.forall { case (t, x) => x * dn <= in + sn * t },
      "the τ=0.9 line must sit on/above every fixture point")
  }

  // ---------------------------------------------------------------
  // q585 conditional entropy
  // ---------------------------------------------------------------

  test("q585: textbook pins — perfectly predictable alternation reads " +
      "CE exactly 0 with gain exactly ⌊10⁶·ln 2⌋; Shannon hand case " +
      "(2/3)·ln 2 exact") {
    import spark.implicits._
    // a: "x y x y x" — every next token determined by the previous:
    //    H(V|U) = 0, H(V) = ln 2 (two symbols, equal mass)
    // b: "p p q q" — bigrams pp/pq/qq: H(V|U) = (2/3)·ln 2 = 462098µ,
    //    H(V) = (1/3)ln3 + (2/3)ln(3/2) = 636514µ, gain 174416µ
    val bg = (s: String) => s.split(' ').sliding(2).toSeq
      .map(p => (p(0), p(1)))
    val rows = bg("x y x y x").map { case (u, v) => ("a", u, v) } ++
      bg("p p q q").map { case (u, v) => ("b", u, v) }
    val out = graft.llm.ConditionalEntropy
      .conditionalEntropy(rows.toDF("g", "u", "v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      ("a", 4L, 2L, 0L, 693147L, 693147L),
      ("b", 3L, 3L, 462098L, 636514L, 174416L)), s"got $out")
  }

  test("q589: Spark soundex matches the classic pinned codes the " +
      "DuckDB replay is built against — H/W transparency, vowel " +
      "reset, first-letter suppression, single-char pad") {
    import spark.implicits._
    val pins = Seq(
      "robert" -> "R163", "tymczak" -> "T522", "pfister" -> "P236",
      "ashcraft" -> "A261", "honeyman" -> "H555", "hmm" -> "H500",
      "xhx" -> "X000", "wright" -> "W623", "hwang" -> "H520",
      "phlox" -> "P420", "aeiou" -> "A000", "a" -> "A000")
    val got = pins.map(_._1).toDF("w")
      .select($"w", soundex($"w").as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    pins.foreach { case (w, c) =>
      assert(got(w) == c, s"soundex($w) = ${got(w)}, pinned $c")
    }
  }

  test("q589: the real dictionary's one phonetic collision pairs " +
      "red/rod inside R300 — unreachable by q109's exact-token block") {
    val out = graft.llm.PhoneticBlocking
      .q589PhoneticBlocking(spark, dir).collect()
    val matched = out.filter(!_.isNullAt(3))
      .map(r => (r.getString(0), r.getString(1), r.getString(3),
        r.getLong(4))).toSeq
    assert(matched.toSet == Set(("red", "R300", "rod", 1L),
      ("rod", "R300", "red", 1L)), s"got $matched")
  }

  test("q588: hand Tukey–Kramer — the far group separates from both " +
      "near groups, the equal pair does not; MSW exact") {
    import spark.implicits._
    // a = b = {1,2,3}, c = {10,11,12}: SSW = 6, ν = 6, Πn = 27,
    // SSWP = 162 → msw_micro = 10⁶; means 2/2/11 → dm 0 and 9·10⁶.
    // Rule: (9e6)²·2·9 = 1.458e15 > 10985910·1e6·6 = 6.59e13 → sig
    val vals = (Seq(1L, 2L, 3L).map(("a", _)) ++
      Seq(1L, 2L, 3L).map(("b", _)) ++
      Seq(10L, 11L, 12L).map(("c", _))).toDF("g", "x")
    val out = TukeyHsd.hsd(vals).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toSeq
    assert(out == Seq(
      ("a", "b", 0L, 1000000L, false),
      ("a", "c", 9000000L, 1000000L, true),
      ("b", "c", 9000000L, 1000000L, true)), s"got $out")
  }

  test("q587: hand-pinned dispersion — clumped token reads D > 1, " +
      "evenly spread token D < 1, zeros counted in the variance") {
    import spark.implicits._
    // docs: "a a a a" / "b a" / "b c", N = 3:
    // a: counts [4,1,0] → D = (3·17−25)/(3·5) = 26/15 → 1733333µ
    // b: [0,1,1] → 2/6 → 333333µ;  c: [0,0,1] → 2/3 → 666666µ
    val docs = Seq((1L, "a a a a"), (2L, "b a"), (3L, "b c"))
      .toDF("doc_id", "text")
    val out = graft.llm.TokenDispersion.dispersion(docs, minMass = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      ("a", 2L, 5L, 17L, 1733333L),
      ("c", 1L, 1L, 1L, 666666L),
      ("b", 2L, 2L, 2L, 333333L)), s"got $out")
  }

  test("q585: on real corpus text one token of context buys " +
      "strictly positive information in every source") {
    val out = graft.llm.ConditionalEntropy
      .q585ConditionalEntropy(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(5) > 0L,
        s"source ${r.getString(0)} reads info gain ${r.getLong(5)}")
      assert(r.getLong(3) >= 0L && r.getLong(4) >= r.getLong(3))
    }
  }
}
