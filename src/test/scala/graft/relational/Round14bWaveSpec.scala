package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 second-wave operator gates. */
class Round14bWaveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q527: Brown-Forsythe pieces and F match the hand computation " +
      "(median-centred deviations, exact sums)") {
    import spark.implicits._
    // group a = (0, 10): med2 = 10, z2 = (10, 10)
    // group b = (0, 0, 30): med2 = 0, z2 = (0, 0, 60)
    // s_tot = 80, q_sum = 200 + 1200 = 1400, q2 = 3800
    // SSB = 1400 - 80^2/5 = 120, SSW = 2400 -> F = 3 * 120/2400 = 0.15
    val rows = Seq(("a", 0L, 1L), ("a", 10L, 2L),
      ("b", 0L, 3L), ("b", 0L, 4L), ("b", 30L, 5L))
      .toDF("grp", "v", "uid")
    val out = BrownForsythe.bfTest(rows).collect().head
    assert(out.getAs[Long]("n") == 5L && out.getAs[Long]("k") == 2L)
    assert(out.getAs[Long]("s_tot") == 80L)
    assert(out.getAs[Long]("q_sum") == 1400L)
    assert(out.getAs[Long]("q2") == 3800L)
    assert(math.abs(out.getAs[Double]("f") - 0.15) < 1e-12)
    assert(!out.getAs[Boolean]("reject_95"))
    // IDENTICAL spreads around different centres: the median centring
    // removes the location difference entirely, leaving zero within-
    // AND between-variance -> the NULLIF guard degrades to NULL in
    // both engines instead of crash-vs-divide-by-zero divergence
    val shifted = Seq(("a", 0L, 1L), ("a", 20L, 2L),
      ("b", 1000L, 3L), ("b", 1020L, 4L)).toDF("grp", "v", "uid")
    val f2 = BrownForsythe.bfTest(shifted).collect().head
    assert(f2.isNullAt(f2.fieldIndex("f")),
      "degenerate zero-variance case must emit NULL, not crash")
  }

  test("q528: Jonckheere-Terpstra matches the textbook pieces on a " +
      "clean ordered pair of groups, and ties carry half-weight") {
    import spark.implicits._
    // g1 = (1, 2), g2 = (3, 4): all 4 cross pairs ascend -> JT = 4,
    // jt2 = 8; mean2 = (16 - 8)/2 = 4; no ties -> var = 120/72 = 5/3;
    // z = 4 / (2 * sqrt(5/3))
    val rows = Seq((1, 1L), (1, 2L), (2, 3L), (2, 4L)).toDF("g", "v")
    val out = JonckheereTerpstra.jtTest(rows, 2).collect().head
    assert(out.getAs[Long]("n") == 4L)
    assert(out.getAs[Long]("jt2") == 8L)
    assert(out.getAs[Long]("mean2") == 4L)
    assert(out.getAs[Long]("ag") == 36L && out.getAs[Long]("at") == 0L)
    assert(out.getAs[Long]("cg") == 4L && out.getAs[Long]("ct") == 0L)
    assert(math.abs(out.getAs[Double]("z")
      - 4.0 / (2.0 * math.sqrt(5.0 / 3.0))) < 1e-12)
    // a cross-group tie contributes half a pair: g1=(5), g2=(5, 6)
    // -> JT = 0.5 + 1 -> jt2 = 3
    val tied = Seq((1, 5L), (2, 5L), (2, 6L)).toDF("g", "v")
    val t = JonckheereTerpstra.jtTest(tied, 2).collect().head
    assert(t.getAs[Long]("jt2") == 3L)
    // one 2-way value tie: t(t-1)(2t+5) = 18, t(t-1) = 2
    assert(t.getAs[Long]("at") == 18L && t.getAs[Long]("ct") == 2L)
  }

  test("q529: Page's L is maximal (z = sqrt(6)) on a perfectly " +
      "ordered block design") {
    import spark.implicits._
    // 3 day blocks, types a < b < c increasing within every block:
    // rd = (2, 4, 6) per block, R2 = (6, 12, 18), c = (1, 2, 3)
    // -> l2 = 84; E = 72; var(L) = 6 -> z = 12/(2*sqrt(6)) = sqrt(6)
    val d0 = java.time.LocalDate.of(2024, 5, 1)
    val daily = (0 until 3).flatMap { b =>
      Seq(("a", 10L + b), ("b", 20L + b), ("c", 30L + b)).map {
        case (t, v) =>
          (t, java.sql.Date.valueOf(d0.plusDays(b.toLong)), v)
      }
    }.toDF("t", "d", "v")
    val out = PageTrend.page(daily).collect().head
    assert(out.getAs[Long]("n_days") == 3L && out.getAs[Long]("k") == 3L)
    assert(out.getAs[Long]("l2") == 84L)
    assert(math.abs(out.getAs[Double]("z") - math.sqrt(6.0)) < 1e-12)
    assert(out.getAs[Boolean]("reject_95"))
    // reversed order must give the mirrored minimal L (z = -sqrt(6))
    val rev = daily.withColumn("v", lit(100L) - $"v")
    val r = PageTrend.page(rev).collect().head
    assert(math.abs(r.getAs[Double]("z") + math.sqrt(6.0)) < 1e-12)
    assert(!r.getAs[Boolean]("reject_95"))
  }

  test("q530: the star is perfectly disassortative (r = -1) and the " +
      "regular graph degrades to NULL, not a crash") {
    import spark.implicits._
    def sym(es: Seq[(Long, Long)]) = {
      val e = es.toDF("u", "v")
      e.unionAll(e.select($"v".as("u"), $"u".as("v"))).localCheckpoint()
    }
    val star = graft.operators.Assortativity.assortativity(
      sym(Seq((0L, 1L), (0L, 2L), (0L, 3L)))).collect().head
    assert(star.getAs[Long]("m2") == 6L)
    assert(math.abs(star.getAs[Double]("r") + 1.0) < 1e-12)
    assert(!star.getAs[Boolean]("assortative"))
    // K3 is 2-regular: zero degree variance -> NULLIF guard
    val k3 = graft.operators.Assortativity.assortativity(
      sym(Seq((1L, 2L), (2L, 3L), (1L, 3L)))).collect().head
    assert(k3.isNullAt(k3.fieldIndex("r")))
  }

  test("q531: betweenness is exact on the path (only the middle " +
      "carries pairs) and splits evenly across the square's two " +
      "shortest paths; eccentricity = BFS depth") {
    import spark.implicits._
    def sym(es: Seq[(Long, Long)]) = {
      val e = es.toDF("u", "v")
      e.unionAll(e.select($"v".as("u"), $"u".as("v"))).localCheckpoint()
    }
    def byV(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("v"),
        (r.getAs[Long]("ecc"), r.getAs[Long]("n_reach"),
          r.getAs[Long]("sum_d"), r.getAs[Long]("bc6")))).toMap
    val path = byV(graft.operators.Betweenness.betweenness(
      sym(Seq((1L, 2L), (2L, 3L)))))
    assert(path == Map(
      1L -> ((2L, 2L, 3L, 0L)),
      2L -> ((1L, 2L, 2L, 1000000L)),
      3L -> ((2L, 2L, 3L, 0L))), s"path graph gave $path")
    // square 1-2-3-4-1: pair (1,3) splits over mids 2 and 4, pair
    // (2,4) over mids 1 and 3 -> every node carries floor(1e6/2);
    // distances per node: 1 + 1 + 2
    val sq = byV(graft.operators.Betweenness.betweenness(
      sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))))
    (1L to 4L).foreach { v =>
      assert(sq(v) == ((2L, 3L, 4L, 500000L)),
        s"square node $v -> ${sq(v)}")
    }
    // fixture: the BFS must close inside the oracle unroll
    val fx = graft.operators.Betweenness.betweenness(
      graft.operators.KTruss.ktEdges(spark, dir).localCheckpoint())
    val maxEcc = fx.agg(max($"ecc")).head().getLong(0)
    assert(maxEcc < graft.operators.Betweenness.BcUnrolledRounds,
      s"fixture diameter $maxEcc reached the oracle unroll bound")
  }

  test("q532: a planted 2-day lead shows up as r = 1 exactly at " +
      "lag +2, with exact count pieces") {
    import spark.implicits._
    val d0 = java.time.LocalDate.of(2024, 7, 1)
    def d(i: Int) = java.sql.Date.valueOf(d0.plusDays(i.toLong))
    // x (view) pulses on days 1 and 4; y (purchase) pulses exactly
    // two days later (3 and 6) -> CCF peaks at lag +2, and the pulses
    // never coincide at lag 0
    val daily = Seq(
      ("view", d(1), 5L), ("view", d(4), 3L),
      ("purchase", d(3), 5L), ("purchase", d(6), 3L)) ++
      (0 to 7).flatMap(i => Seq(("view", d(i), 0L), ("purchase", d(i), 0L)))
    val df = daily.toDF("event_type", "d", "c")
      .groupBy($"event_type", $"d").agg(sum($"c").as("c"))
    val out = CrossCorrelation.ccf(df)
      .collect().map(r => (r.getLong(0), r)).toMap
    val at2 = out(2L)
    assert(math.abs(at2.getAs[Double]("r") - 1.0) < 1e-12,
      s"lag +2 r = ${at2.getAs[Double]("r")}")
    assert(out(0L).getAs[Double]("r") < 0.0,
      "lag 0 must anti-correlate on disjoint pulses")
    // lag +2 pairs: days 0..5 overlap -> m = 6
    assert(at2.getAs[Long]("m") == 6L)
    assert(at2.getAs[Long]("sx") == 8L && at2.getAs[Long]("sy") == 8L)
  }

  test("q533: Slope One reproduces the closed-form textbook " +
      "prediction from exact deviation pieces") {
    import spark.implicits._
    // dev(i2, i1) over c1, c2 = ((4-2) + (5-3))/2 = 2 with n = 2;
    // c3 rated i1 = 10 -> pred(i2) = (dsum + 10*2)/2 = 24/2 = 12
    val ratings = Seq(
      (1L, 101L, 2L), (1L, 102L, 4L),
      (2L, 101L, 3L), (2L, 102L, 5L),
      (3L, 101L, 10L), (3L, 102L, 13L)).toDF("c", "p", "r")
    val holdout = Seq((3L, 102L, 13L)).toDF("c", "i", "actual")
    val out = graft.llm.SlopeOne.predict(ratings, holdout).collect()
    assert(out.length == 1)
    val row = out.head
    // c3 itself co-rates (i2, i1): dev census includes it ->
    // dsum = (4-2) + (5-3) + (13-10) = 7, n = 3; num = 7 + 10*3 = 37
    assert(row.getAs[Long]("num") == 37L && row.getAs[Long]("den") == 3L)
    assert(math.abs(row.getAs[Double]("pred") - 37.0 / 3.0) < 1e-12)
  }

  test("q534: readability counts and both formulas match the hand " +
      "computation, including a negative FK numerator") {
    import spark.implicits._
    val docs = Seq((1L, "The cat sat. It ran!")).toDF("doc_id", "text")
    val out = graft.llm.Readability.readability(docs).collect().head
    assert(out.getAs[Long]("w") == 5L)
    assert(out.getAs[Long]("sen") == 2L)
    assert(out.getAs[Long]("sy") == 5L)
    // 39*25 + 1180*5*2 - 1559*5*2 = -2815 over 100*5*2 = 1000
    assert(out.getAs[Long]("fk_num") == -2815L)
    assert(out.getAs[Long]("fk_den") == 1000L)
    assert(math.abs(out.getAs[Double]("fk_grade") + 2.815) < 1e-12)
    assert(math.abs(out.getAs[Double]("ease")
      - (206.835 - 1.015 * 2.5 - 84.6)) < 1e-12)
  }

  test("q536: join elimination fires only for unreferenced unique-key " +
      "dims — a referenced dim column blocks it, a non-pk key blocks " +
      "it, and null fact keys still drop under the INNER rewrite") {
    import spark.implicits._
    import graft.plans.JoinElimination
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
      }.flatten
    JoinElimination.register("orders.parquet", "o_orderkey")
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ JoinElimination
    try {
      val li = graft.core.Tables.lineitem(spark, dir)
      val o = graft.core.Tables.orders(spark, dir)
      // positive: unreferenced dim joined on its pk -> only fact scanned
      val pos = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      assert(scansOf(pos).forall(_.endsWith("lineitem.parquet")),
        s"eliminable join survived: ${scansOf(pos)}")
      // result equality vs the rule-off plan
      val got = pos.orderBy($"l_returnflag")
        .as[(String, Long)].collect().toSeq
      spark.experimental.extraOptimizations = prev
      val want = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy($"l_returnflag").as[(String, Long)].collect().toSeq
      spark.experimental.extraOptimizations = prev :+ JoinElimination
      assert(got == want, s"rewritten $got != direct $want")
      // negative: a referenced dim column must block elimination
      val refd = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      assert(scansOf(refd).exists(_.endsWith("orders.parquet")),
        "elimination fired despite a referenced dim column")
      // negative: a non-pk join key must block elimination
      val nonPk = li.join(o, li("l_suppkey") === o("o_custkey"))
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      assert(scansOf(nonPk).exists(_.endsWith("orders.parquet")),
        "elimination fired on a non-unique join key")
      // null fact keys: the IsNotNull rewrite preserves inner-join drops
      val tmp = java.nio.file.Files.createTempDirectory("je").toString
      Seq((Some(1L), "a"), (None: Option[Long], "b"), (Some(1L), "c"))
        .toDF("fk", "tag").write.mode("overwrite")
        .parquet(s"$tmp/fact_je.parquet")
      Seq((1L, "dim")).toDF("k", "pay").write.mode("overwrite")
        .parquet(s"$tmp/dim_je.parquet")
      JoinElimination.register("dim_je.parquet", "k")
      val fact = spark.read.parquet(s"$tmp/fact_je.parquet")
      val dim = spark.read.parquet(s"$tmp/dim_je.parquet")
      val joined = fact.join(dim, fact("fk") === dim("k"))
        .select($"tag").orderBy($"tag")
      assert(scansOf(joined).forall(_.contains("fact_je")),
        s"tmp dim not eliminated: ${scansOf(joined)}")
      assert(joined.as[String].collect().toSeq == Seq("a", "c"),
        "the null-key fact row must stay dropped")
      // r14 advice (medium): Project(dim_col, Filter(fact_pred, f ⋈ d))
      // — the filter passes the dim column through to its projecting
      // parent; a bare Filter-case rule saw only the filter's own
      // references and eliminated the join out from under the Project
      // (unresolved attribute at execution). Must keep the dim AND
      // return the right rows.
      val projOverFilter = fact.join(dim, fact("fk") === dim("k"))
        .filter($"tag" =!= "zz")
        .select($"pay", $"tag").orderBy($"tag")
      assert(scansOf(projOverFilter).exists(_.contains("dim_je")),
        "elimination fired under a Filter whose parent reads dim cols")
      assert(projOverFilter.as[(String, String)].collect().toSeq ==
        Seq(("dim", "a"), ("dim", "c")))
      // and the same shape with NO dim reference above still eliminates
      val filterNoDim = fact.join(dim, fact("fk") === dim("k"))
        .filter($"tag" =!= "zz")
        .select($"tag").orderBy($"tag")
      assert(scansOf(filterNoDim).forall(_.contains("fact_je")),
        s"Project-Filter shape without dim refs kept the join: " +
          s"${scansOf(filterNoDim)}")
      assert(filterNoDim.as[String].collect().toSeq == Seq("a", "c"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("q535: Ansari-Bradley scores rank inward from both ends — the " +
      "extreme-holding group scores low and z matches the hand value") {
    import spark.implicits._
    // g1 = (1, 4) holds the extremes, g2 = (2, 3) the middle:
    // doubled scores (2,4,4,2); ab2 = 4, E = 6, var = 4/3
    val rows = Seq((1L, 1L), (2L, 2L), (2L, 3L), (1L, 4L)).toDF("g", "v")
    val out = AnsariBradley.abTest(rows).collect().head
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("n1") == 2L)
    assert(out.getAs[Long]("ab2") == 4L)
    assert(out.getAs[Long]("s2") == 12L && out.getAs[Long]("q2") == 40L)
    assert(math.abs(out.getAs[Double]("z") + math.sqrt(3.0)) < 1e-12)
    assert(!out.getAs[Boolean]("reject_95"))
  }

  test("q537: Hodges-Lehmann selection over the implicit pair set " +
      "matches the brute-force pairwise median, ties and even counts " +
      "included") {
    import spark.implicits._
    def brute(xs: Seq[Long], ys: Seq[Long]): (Long, Double) = {
      val ds = (for (x <- xs; y <- ys) yield x - y).sorted
      val p = ds.length
      val hl2 = ds((p + 1) / 2 - 1) + ds((p + 2) / 2 - 1)
      (hl2, hl2 / 2.0)
    }
    def run(xs: Seq[Long], ys: Seq[Long],
        forceDistributed: Boolean = false) = {
      val rows = (xs.map((1L, _)) ++ ys.map((2L, _))).toDF("g", "v")
      val out = HodgesLehmann.hlShift(rows, forceDistributed)
        .collect().head
      (out.getAs[Long]("hl2"), out.getAs[Double]("hl_shift"))
    }
    // classic textbook shift: even pair count, with duplicates
    val xs = Seq(10L, 14L, 14L, 21L)
    val ys = Seq(3L, 5L, 9L)
    assert(run(xs, ys) == brute(xs, ys))
    // odd pair count + negative shift + heavy ties
    val xs2 = Seq(1L, 1L, 2L)
    val ys2 = Seq(4L, 4L, 4L)
    assert(run(xs2, ys2) == brute(xs2, ys2))
    // even pair count where the two middle order stats are DISTINCT
    // diffs (count at d_(kLo) is exactly kLo) — exercises the
    // next-distinct-diff running-max pass
    val xs3 = Seq(1L, 2L)
    val ys3 = Seq(0L, 0L)
    assert(run(xs3, ys3) == brute(xs3, ys3))
    assert(run(xs3, ys3) == ((3L, 1.5)))
    // the distributed merged-scan fallback must agree everywhere the
    // broadcast fast path runs
    Seq((xs, ys), (xs2, ys2), (xs3, ys3)).foreach { case (a, b) =>
      assert(run(a, b, forceDistributed = true) == brute(a, b))
    }
  }

  test("q538: Cramer-von Mises matches the hand rank computation on " +
      "interleaved samples") {
    import spark.implicits._
    // g1 = (1, 3), g2 = (2, 4): U = 12, u2 = 48, T = 0.125
    val rows = Seq((1L, 1L, 1L), (1L, 3L, 2L), (2L, 2L, 3L), (2L, 4L, 4L))
      .toDF("g", "v", "uid")
    val out = CramerVonMises.cvmTest(rows).collect().head
    assert(out.getAs[Long]("n1") == 2L && out.getAs[Long]("n2") == 2L)
    assert(out.getAs[Long]("u2") == 48L)
    assert(math.abs(out.getAs[Double]("t") - 0.125) < 1e-12)
    assert(!out.getAs[Boolean]("reject_95"))
  }

  test("q539: the runs test counts maximal runs against the median " +
      "cut and matches the hand moments") {
    import spark.implicits._
    val d0 = java.time.LocalDate.of(2024, 8, 1)
    // series (1,9,1,9,1): med2 = 2, signs (0,1,0,1,0) -> 5 runs,
    // n+ = 2, n- = 3, E[R] = 3.4, Var = 0.84
    val daily = Seq(1L, 9L, 1L, 9L, 1L).zipWithIndex.map { case (v, i) =>
      ("a", java.sql.Date.valueOf(d0.plusDays(i.toLong)), v)
    }.toDF("t", "d", "v")
    val out = RunsTest.runsTest(daily).collect().head
    assert(out.getAs[Long]("n") == 5L)
    assert(out.getAs[Long]("n_pos") == 2L && out.getAs[Long]("n_neg") == 3L)
    assert(out.getAs[Long]("runs") == 5L)
    assert(math.abs(out.getAs[Double]("z")
      - (5.0 - 3.4) / math.sqrt(0.84)) < 1e-12)
  }

  test("q540: Durbin-Watson micro-units hit the hand long-division " +
      "pin on alternation, stay low on a smooth ramp, and a perfect " +
      "linear fit degrades to NULL") {
    import spark.implicits._
    val d0 = java.time.LocalDate.of(2024, 8, 1)
    def series(vs: Seq[Long]) = vs.zipWithIndex.map { case (v, i) =>
      ("a", java.sql.Date.valueOf(d0.plusDays(i.toLong)), v)
    }.toDF("t", "d", "x")
    // alternating residuals around a flat line -> dw near 4. Hand
    // pin: E = (-1800, 3960, -2880, 2880, -3960, 1800), num =
    // 193_104_000, den = 54_432_000, digit groups q=3, m1=547,
    // m2=619 -> dw_micro = 3_547_619 (= floor(1e6*num/den), exact).
    val alt = DurbinWatson.durbinWatson(
      series(Seq(10L, 20L, 10L, 20L, 10L, 20L))).collect().head
    assert(alt.getAs[Long]("dw_micro") == 3547619L,
      s"alternation gave dw_micro = ${alt.getAs[Long]("dw_micro")}")
    // a smooth parabola's residuals hug the trend -> dw well below 2
    val ramp = DurbinWatson.durbinWatson(
      series(Seq(0L, 1L, 4L, 9L, 16L, 25L, 36L, 49L))).collect().head
    assert(ramp.getAs[Long]("dw_micro") < 1000000L,
      s"smooth curvature gave dw_micro = ${ramp.getAs[Long]("dw_micro")}")
    // exact line: zero residuals -> NULLIF degrades to NULL
    val line = DurbinWatson.durbinWatson(
      series(Seq(2L, 4L, 6L, 8L))).collect().head
    assert(line.isNullAt(line.fieldIndex("dw_micro")))
  }

  test("q541: Cochran-Armitage z = 2 on the clean dose-response hand " +
      "table") {
    import spark.implicits._
    // g1: 2 orders, 0 returns; g2: 2 orders, 2 returns -> z = 2
    val rows = Seq((1L, 0L), (1L, 0L), (2L, 1L), (2L, 1L)).toDF("g", "y")
    val out = CochranArmitage.caTest(rows).collect().head
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("rr") == 2L)
    assert(out.getAs[Long]("sgn") == 6L && out.getAs[Long]("sgr") == 4L)
    assert(out.getAs[Long]("sggn") == 10L)
    assert(math.abs(out.getAs[Double]("z") - 2.0) < 1e-12)
    assert(out.getAs[Boolean]("reject_95"))
  }

  test("q542: Mood's median test matches the hand 2x2 table " +
      "(chi2 = 4 on clean separation)") {
    import spark.implicits._
    // a = (1,2), b = (3,4): pooled med2 = 5, above = {3,4} -> A = 2,
    // qsum = 16, chi2 = 16/(2*2) = 4
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 3L),
      ("b", 4L, 4L)).toDF("grp", "v", "uid")
    val out = MoodMedian.moodTest(rows).collect().head
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("k") == 2L)
    assert(out.getAs[Long]("a_tot") == 2L)
    assert(out.getAs[Long]("q_sum") == 16L)
    assert(math.abs(out.getAs[Double]("chi2") - 4.0) < 1e-12)
  }

  test("q543: the multiprobe set is the full Hamming<=2 ball and the " +
      "single-table index finds a planted identical twin") {
    import spark.implicits._
    import graft.llm.MultiprobeLsh
    val masks = MultiprobeLsh.ProbeMasks
    assert(masks.length == 1 + 12 + 66)
    assert(masks.distinct.length == masks.length)
    assert(masks.forall(m => java.lang.Long.bitCount(m) <= 2))
    // two identical vectors among scatter: each must find the other
    // at quantized cosine ~1 (identical signature -> mask 0 probe)
    val d = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(d)(i => math.sin(seed * 37.0 + i).toFloat)
    val rows = (Seq((1L, vec(1)), (2L, vec(1))) ++
      (3L to 12L).map(i => (i, vec(i.toInt)))).toDF("vec_id", "embedding")
    val top = MultiprobeLsh.multiprobeAnn(rows)
      .collect().map(r => (r.getLong(0), (r.getLong(1),
        r.getAs[Double]("cos_sim")))).toMap
    assert(top(1L)._1 == 2L && top(2L)._1 == 1L,
      s"identical twins not mutual top-1: ${top(1L)}, ${top(2L)}")
    assert(top(1L)._2 > 0.999)
    // fixture gate: recall over the planted twins clears the floor
    val gate = graft.llm.MultiprobeLsh.q543MultiprobeRecall(spark, dir)
      .collect().head
    assert(gate.getAs[Boolean]("ok"),
      s"multiprobe recall under floor on ${gate.getAs[Long]("n_queries")} queries")
  }

  test("q544: local clustering matches the hand graph (triangle nodes " +
      "1e6 and 1/3e6, pendant 0 under the degree guard)") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val got = graft.operators.LocalClustering.localClustering(edges)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L)), 4L -> ((1L, 0L, 0L))), s"got $got")
  }

  test("q545: PPS-systematic draws exactly the selection-point count, " +
      "multi-hits giants, and never misses a >=step document") {
    import spark.implicits._
    val out = PpsSample.q545PpsSample(spark, dir).localCheckpoint()
    val docs = graft.core.Tables(spark, dir, "documents")
      .select(size(split($"text", " ")).cast("long").as("nt"))
    val total = docs.agg(sum($"nt")).as[Long].head()
    val expectedPoints =
      (total - PpsSample.PpsOffset) / PpsSample.PpsStep + 1
    val gotHits = out.agg(sum($"hits")).as[Long].head()
    assert(gotHits == expectedPoints,
      s"selected $gotHits points, axis holds $expectedPoints")
    // every document at least step tokens long MUST be drawn
    val giants = docs.filter($"nt" >= PpsSample.PpsStep).count()
    val drawnGiants = out.filter($"n_tokens" >= PpsSample.PpsStep).count()
    assert(giants == drawnGiants, s"missed ${giants - drawnGiants} giants")
    assert(out.filter($"hits" < 1L).count() == 0L)
  }

  test("q546: partial correlation of two one-hot series given the " +
      "third is exactly -1") {
    import spark.implicits._
    val d0 = java.time.LocalDate.of(2024, 9, 1)
    def d(i: Int) = java.sql.Date.valueOf(d0.plusDays(i.toLong))
    val daily = Seq(
      ("view", d(0), 1L), ("purchase", d(1), 1L), ("error", d(2), 1L))
      .toDF("event_type", "d", "c")
    val out = PartialCorrelation
      .partialCorr(daily, "view", "purchase", "error").collect().head
    assert(out.getAs[Long]("n") == 3L)
    assert(math.abs(out.getAs[Double]("r_xy") + 0.5) < 1e-12)
    assert(math.abs(out.getAs[Double]("r_partial") + 1.0) < 1e-12)
  }

  test("q547: ICC is exactly 1 on perfectly clustered groups and the " +
      "pieces are exact") {
    import spark.implicits._
    val rows = Seq(("a", 10L), ("a", 10L), ("b", 20L), ("b", 20L))
      .toDF("grp", "v")
    val out = IntraclassCorrelation.iccTest(rows).collect().head
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("k") == 2L)
    assert(out.getAs[Long]("q_sum") == 1000L
      && out.getAs[Long]("q2") == 1000L)
    assert(math.abs(out.getAs[Double]("icc") - 1.0) < 1e-12)
    // zero between-variance: both groups identical -> ICC <= 0
    val flat = Seq(("a", 10L), ("a", 20L), ("b", 10L), ("b", 20L))
      .toDF("grp", "v")
    val f = IntraclassCorrelation.iccTest(flat).collect().head
    assert(f.getAs[Double]("icc") <= 0.0)
  }

  test("q548: the CDF remap matches hand values, constant images map " +
      "to 0, and the real decode seam matches the generator closed " +
      "form on every fixture image") {
    import graft.llm.ImageHistogram
    // hist (2,0,2...) of n=4: cdf_min=2 -> eq = (0, 0, 255, 255, ...)
    val hist = new Array[Long](ImageHistogram.HistBins)
    hist(0) = 2; hist(2) = 2
    val eq = ImageHistogram.equalize(4L, hist)
    assert(eq(0) == 0L && eq(1) == 0L && eq(2) == 255L && eq(3) == 255L)
    // constant image: everything in one bin -> all-zero remap, no 0/0
    val const = new Array[Long](ImageHistogram.HistBins)
    const(5) = 9
    assert(ImageHistogram.equalize(9L, const).forall(_ == 0L))
    val out = ImageHistogram.q548ImageHistogram(spark, dir).collect().head
    assert(out.getAs[Long]("n_images") ==
      graft.llm.MultimodalOracle.MediaDocBound)
    assert(out.getAs[Boolean]("ok"))
  }

  test("q549: Cronbach's alpha is 1 on perfectly parallel items and " +
      "degrades to NULL when the total has no variance") {
    import spark.implicits._
    val d0 = java.time.LocalDate.of(2024, 10, 1)
    def d(i: Int) = java.sql.Date.valueOf(d0.plusDays(i.toLong))
    val parallel = Seq(("a", d(0), 0L), ("a", d(1), 2L),
      ("b", d(0), 0L), ("b", d(1), 2L)).toDF("t", "d", "v")
    val out = CronbachAlpha.alpha(parallel).collect().head
    assert(out.getAs[Long]("n_days") == 2L && out.getAs[Long]("k") == 2L)
    assert(out.getAs[Long]("v_items") == 8L
      && out.getAs[Long]("v_total") == 16L)
    assert(math.abs(out.getAs[Double]("alpha") - 1.0) < 1e-12)
    // perfectly anti-correlated items: constant totals -> NULL
    val anti = Seq(("a", d(0), 0L), ("a", d(1), 2L),
      ("b", d(0), 2L), ("b", d(1), 0L)).toDF("t", "d", "v")
    val a2 = CronbachAlpha.alpha(anti).collect().head
    assert(a2.isNullAt(a2.fieldIndex("alpha")))
  }

  test("q550: the rich-club curve matches the hand K4-plus-pendant " +
      "graph, including a cutoff whose next present degree is absent") {
    import spark.implicits._
    // K4 on {1,2,3,4} + pendant 4-5: degrees 3,3,3,4,1 — cutoff k=1
    // has NO edge with min degree exactly 2, so a sparse suffix join
    // would misread 0 edges there
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("u", "v")
    val got = graft.operators.RichClub.richClub(edges)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      0L -> ((5L, 7L, 700000L)),
      1L -> ((4L, 6L, 1000000L)),
      2L -> ((4L, 6L, 1000000L))), s"got $got")
  }

  test("q551: Wilson intervals pin exactly to 0 and 1 at the " +
      "all-failure / all-success boundaries where Wald collapses") {
    import spark.implicits._
    val rows = (Seq.fill(10)(("none", 0L)) ++ Seq.fill(10)(("all", 1L)) ++
      Seq(("half", 0L), ("half", 1L))).toDF("grp", "y")
    val out = WilsonInterval.wilson(rows)
      .collect().map(r => (r.getString(0), r)).toMap
    assert(math.abs(out("none").getAs[Double]("lo")) < 1e-12,
      "k = 0 must pin lo to exactly 0")
    assert(out("none").getAs[Double]("hi") > 0.0
      && out("none").getAs[Double]("hi") < 0.35)
    assert(math.abs(out("all").getAs[Double]("hi") - 1.0) < 1e-12,
      "k = n must pin hi to exactly 1")
    val h = out("half")
    assert(math.abs(h.getAs[Double]("center") - 0.5) < 1e-12)
    assert(h.getAs[Double]("lo") > 0.0 && h.getAs[Double]("hi") < 1.0)
  }

  test("q552: the funnel z matches the pooled closed form recomputed " +
      "from its own exact pieces, on the fixture") {
    val rows = FunnelProportionTest.q552FunnelProportion(spark, dir)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (n1, k1) = (r.getAs[Long]("n1"), r.getAs[Long]("k1"))
      val (n2, k2) = (r.getAs[Long]("n2"), r.getAs[Long]("k2"))
      assert(k1 <= n1 && k2 <= n2 && n1 > 0 && n2 > 0)
      val p = (k1 + k2).toDouble / (n1 + n2)
      val want = (k1.toDouble / n1 - k2.toDouble / n2) /
        math.sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n2))
      assert(math.abs(r.getAs[Double]("z") - want) < 1e-9,
        s"stage ${r.getAs[String]("stage")}")
    }
  }

  test("q553: truncated dyadic Katz matches the hand walk counts on " +
      "the path graph") {
    import spark.implicits._
    // path 1-2-3, H=6, scale 4^(6-L). Walk counts per L:
    //   node 2: L1=2 L2=2 L3=4 L4=4 L5=8 L6=8
    //   node 1 (and 3): L1=1 L2=2 L3=2 L4=4 L5=4 L6=8
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val sym = e.unionAll(e.select($"v".as("u"), $"u".as("v")))
      .localCheckpoint()
    val got = graft.operators.KatzCentrality.katz(sym)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val s1 = 1L * 1024 + 2 * 256 + 2 * 64 + 4 * 16 + 4 * 4 + 8
    val s2 = 2L * 1024 + 2 * 256 + 4 * 64 + 4 * 16 + 8 * 4 + 8
    assert(got == Map(1L -> s1, 2L -> s2, 3L -> s1), s"got $got")
  }

  test("q554: the disparity filter keeps a weak node's dominant edge, " +
      "prunes a hub's uniform fan-out, and keeps pendants") {
    import spark.implicits._
    // hub 0 spreads weight 1 over 10 spokes (uniform -> all pruned
    // from 0's side); spoke 1 additionally carries a locally dominant
    // heavy edge to 11 (pendant at 11 -> kept from 11's side);
    // every spoke i>=2 has degree 1 at its far end -> kept as pendant
    val wedges = ((1L to 10L).map(i => (0L, i, 1L)) :+ (1L, 11L, 50L))
      .toDF("i", "j", "w")
    val kept = graft.operators.DisparityFilter.backbone(wedges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1, 11): 11 is pendant -> kept; also dominant at node 1
    assert(kept.contains((1L, 11L)))
    // spokes (0, i) for i >= 2: node i has degree 1 -> kept by the
    // pendant convention even though the hub side is uniform
    (2L to 10L).foreach(i => assert(kept.contains((0L, i))))
    // (0, 1): node 0 uniform (1/10 share, e=8 capped:
    // 16*(9/10)^8 = 6.88 > 1 -> not significant); node 1 has degree
    // 2 and the edge is 1/51 of its strength -> not significant, and
    // neither endpoint is pendant -> pruned
    assert(!kept.contains((0L, 1L)), s"kept = $kept")
  }

  test("q555: categorical assortativity is 1 on two same-attribute " +
      "cliques, negative on a bipartite cross, NULL on one attribute") {
    import spark.implicits._
    def sym(es: Seq[(Long, Long)]) = {
      val e = es.toDF("u", "v")
      e.unionAll(e.select($"v".as("u"), $"u".as("v"))).localCheckpoint()
    }
    import graft.operators.AttributeAssortativity.attrAssortativity
    // two triangles, each mono-attribute -> r = 1
    val twoCliques = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)))
    val lab = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("v", "attr")
    val r1 = attrAssortativity(twoCliques, lab).collect().head
    assert(r1.getAs[Long]("e_same") == 12L)
    assert(math.abs(r1.getAs[Double]("r") - 1.0) < 1e-12)
    // complete bipartite K2,2 across attributes -> heterophily, r < 0
    val cross = sym(Seq((1L, 4L), (1L, 5L), (2L, 4L), (2L, 5L)))
    val lab2 = Seq((1L, 0L), (2L, 0L), (4L, 1L), (5L, 1L))
      .toDF("v", "attr")
    val r2 = attrAssortativity(cross, lab2).collect().head
    assert(r2.getAs[Long]("e_same") == 0L)
    assert(r2.getAs[Double]("r") < 0.0)
    // a single attribute: denominator degenerates -> NULL, not crash
    val mono = attrAssortativity(cross,
      Seq((1L, 7L), (2L, 7L), (4L, 7L), (5L, 7L)).toDF("v", "attr"))
      .collect().head
    assert(mono.isNullAt(mono.fieldIndex("r")))
  }

  test("q556: full-pivot edge betweenness matches the hand path and " +
      "splits the square's pair flow across its two geodesics") {
    import spark.implicits._
    def sym(es: Seq[(Long, Long)]) = {
      val e = es.toDF("u", "v")
      e.unionAll(e.select($"v".as("u"), $"u".as("v"))).localCheckpoint()
    }
    import graft.operators.EdgeBetweenness.edgeBetweenness
    // path 1-2-3, all pivots: each edge carries its incident pair
    // (1e6) plus half... no — the (1,3) pair fully crosses both edges
    val path = edgeBetweenness(sym(Seq((1L, 2L), (2L, 3L))), "~")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(path == Map((1L, 2L) -> 2000000L, (2L, 3L) -> 2000000L),
      s"path gave $path")
    // square 1-2-3-4-1: adjacent pairs ride their edge (1e6); the two
    // diagonal pairs split over two geodesics -> each edge carries
    // 1e6 + 2 * 500000 = 2e6
    val sq = edgeBetweenness(
      sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))), "~")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    sq.foreach { case (e, v) =>
      assert(v == 2000000L, s"square edge $e carried $v")
    }
  }

  test("q557: pass@k hits the closed-form textbook values, clamps to " +
      "certainty when failures run out, and excludes n < k tasks") {
    import spark.implicits._
    import graft.llm.PassAtK
    // k = 5. A: 2 of 6 correct -> only 4 failures exist -> pass = 1.
    // B: 1 of 6 -> 1 - C(5,5)/C(6,5) = 5/6. C: 0 of 6 -> 0.
    // D: n = 4 < k -> excluded.
    val attempts =
      (Seq.fill(2)(("A", 1L)) ++ Seq.fill(4)(("A", 0L)) ++
        (("B", 1L) +: Seq.fill(5)(("B", 0L))) ++
        Seq.fill(6)(("C", 0L)) ++ Seq.fill(4)(("D", 1L)))
        .toDF("task", "correct")
    val got = PassAtK.passAtK(attempts)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got == Map("A" -> 1000000L, "B" -> 833334L, "C" -> 0L),
      s"got $got")
  }

  test("q558: Viterbi segmentation beats greedy longest-match where " +
      "they differ, falls back to chars, and loses no fixture word " +
      "to the length filter") {
    import spark.implicits._
    import graft.llm.ViterbiSegment
    // dictionary where greedy longest-match-first (the WordPiece
    // discipline) takes abc|d|e = 3 pieces but ab|cde = 2 is optimal
    val dict = Set("a", "b", "c", "d", "e", "ab", "abc", "cde")
    assert(ViterbiSegment.minPieces("abcde", dict) == 2)
    assert(ViterbiSegment.minPieces("abc", dict) == 1)
    // chars-only coverage fallback
    assert(ViterbiSegment.minPieces("edcba", dict) == 5)
    // the fixture's word census is fully inside the DP length bound
    val all = graft.core.Tables(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
    assert(all.filter(length($"word") >
      ViterbiSegment.VsMaxWordLen).count() == 0L,
      "a corpus word exceeds the oracle unroll bound")
    // end-to-end: every emitted n_pieces is between 1 and word length
    val out = ViterbiSegment.q558ViterbiSegment(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, np) = (r.getString(0), r.getLong(2))
      assert(np >= 1L && np <= w.length.toLong, s"$w -> $np")
    }
  }
}
