package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 operator gates: Borůvka MST / single-linkage, conductance,
  * the relative-error quantile census (batch + stream state), truncated
  * dyadic SimRank, and frequent 4-itemsets.
  */
class Round15WaveSpec extends SparkSpec {

  // ---------------------------------------------------------------
  // q559 Borůvka MST + single-linkage
  // ---------------------------------------------------------------

  test("q559: MST of a hand graph is the Kruskal-unique tree, with " +
      "sl_rank the ascending-weight single-linkage merge order") {
    import spark.implicits._
    // K4-ish: MST must take (1,2,10), (2,3,20), (3,4,30) and skip
    // (1,3,50), (1,4,60)
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L),
      (1L, 3L, 50L), (1L, 4L, 60L)).toDF("u", "v", "w")
    val out = graft.operators.BoruvkaMst.mst(edges)
      .select($"u", $"v", $"dist_ppm", $"sl_rank")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(out.map(e => (e._1, e._2, e._3)) ==
      Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L)),
      s"wrong tree/order: $out")
    // single-linkage dendrogram (Gower–Ross): merge 1 joins {1},{2} at
    // h=10; merge 2 joins {1,2},{3} at 20; merge 3 joins {1,2,3},{4}
    // at 30 — the sl_rank sequence IS that merge sequence
    assert(out.map(_._4) == Seq(1L, 2L, 3L))
  }

  test("q559: a long path hooks in one round through deep pointer " +
      "chains (the halving path), and a disconnected input yields the " +
      "spanning forest") {
    import spark.implicits._
    // path 1-2-3-4-5-6 with ascending weights: every component's min
    // edge points left, so round 1 chooses ALL edges and contraction
    // must collapse a 6-deep chain via pointer halving
    val path = (1L to 5L).map(i => (i, i + 1, 10L * i)).toDF("u", "v", "w")
    val outP = graft.operators.BoruvkaMst.mst(path)
      .select($"u", $"v", $"merge_round")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(outP.size == 5 && outP.forall(_._3 == 1L),
      s"path should hook entirely in round 1: $outP")
    // two components -> forest with one edge per component
    val forest = Seq((1L, 2L, 5L), (10L, 11L, 7L)).toDF("u", "v", "w")
    val outF = graft.operators.BoruvkaMst.mst(forest)
      .select($"u", $"v").as[(Long, Long)].collect().toSeq.sorted
    assert(outF == Seq((1L, 2L), (10L, 11L)))
  }

  test("q559: ties broken by the (w, u, v) total order give a unique " +
      "deterministic MST") {
    import spark.implicits._
    // triangle with ALL-equal weights: the unique MST under the total
    // order keeps (1,2) and (1,3), drops (2,3)
    val tri = Seq((1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L))
      .toDF("u", "v", "w")
    val out = graft.operators.BoruvkaMst.mst(tri)
      .select($"u", $"v").as[(Long, Long)].collect().toSeq.sorted
    assert(out == Seq((1L, 2L), (1L, 3L)), s"tie-break drifted: $out")
  }

  // ---------------------------------------------------------------
  // q560 conductance / normalized cut
  // ---------------------------------------------------------------

  test("q560: two triangles joined by one bridge — each community has " +
      "cut 1, vol 7, conductance 142857 ppm, ncut 2/7") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val edges = und.map { case (a, b) => (a, b) }
      .++(und.map { case (a, b) => (b, a) }).toDF("u", "v")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L),
      (6L, 2L)).toDF("node", "label")
    val out = graft.operators.Conductance.conductanceOf(edges, labels)
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 3L)
      assert(r.getAs[Long]("cut") == 1L)
      assert(r.getAs[Long]("vol") == 7L)
      assert(r.getAs[Long]("conductance_ppm") == 142857L)
      assert(math.abs(r.getAs[Double]("ncut") - 2.0 / 7.0) < 1e-12)
    }
  }

  test("q560: a single all-edges community degrades to NULL (NULLIF " +
      "guard), and a Louvain-refined labeling runs through the same " +
      "census") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("u", "v")
    val one = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("node", "label")
    val r = graft.operators.Conductance.conductanceOf(edges, one)
      .collect().head
    assert(r.getAs[Long]("cut") == 0L && r.getAs[Long]("vol") == 4L)
    assert(r.isNullAt(r.fieldIndex("conductance_ppm")),
      "min(vol, 2m - vol) = 0 must yield NULL, not a crash")
    // labeling-agnostic: feed a Louvain-refined labeling (two hand
    // triangles; the refinement keeps or improves the split) — every
    // emitted conductance is a valid ppm
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val sym = und.++(und.map { case (a, b) => (b, a) }).toDF("u", "v")
      .localCheckpoint()
    val (lab, _, _, _) = graft.operators.Louvain.refine(sym,
      graft.operators.LabelPropagation.propagate(sym))
    val rows = graft.operators.Conductance.conductanceOf(sym, lab)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      if (!x.isNullAt(x.fieldIndex("conductance_ppm"))) {
        val ppm = x.getAs[Long]("conductance_ppm")
        assert(ppm >= 0L && ppm <= 1000000L)
      }
    }
  }

  // ---------------------------------------------------------------
  // q561 relative-error quantile census (batch) + qs27 state
  // ---------------------------------------------------------------

  test("q561: decimal log-buckets give midpoint estimates within the " +
      "guaranteed 5% at every probe, exactly at single-digit values") {
    import spark.implicits._
    val vals = (1L to 1000L).toDF("v")
    val out = ReqSketch.reqQuantiles(vals).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Boolean]("ok"),
        s"relative error bound violated: $r")
    }
    // p999 on 1..1000: k = 999*999 div 1000 + 1 = 999 -> exact 999,
    // bucket (d10=3, m=99) midpoint 995
    val p999 = out.find(_.getAs[Long]("p_permille") == 999L).get
    assert(p999.getAs[Long]("exact") == 999L)
    assert(p999.getAs[Long]("est") == 995L)
  }

  test("qs27 state: bucket ids and midpoints match the q561 " +
      "arithmetic, and shard merge is bit-identical counter addition") {
    import graft.streaming.ReqStream
    assert(ReqStream.bucketOf(5L) == 105L)
    assert(ReqStream.estimateOf(105L) == 5L)
    assert(ReqStream.bucketOf(12345L) == 512L)
    assert(ReqStream.estimateOf(512L) == 12500L)
    assert(ReqStream.bucketOf(99L) == 299L)
    assert(ReqStream.estimateOf(299L) == 99L)
    val all = (1L to 5000L) ++ Seq(7L, 7L, 1234567L)
    val single = new ReqStream.ReqState
    all.foreach(single.update)
    // 3-way shard split, merged
    val shards = (0 until 3).map { sh =>
      val st = new ReqStream.ReqState
      all.zipWithIndex.filter(_._2 % 3 == sh).map(_._1).foreach(st.update)
      st.serialized
    }
    val merged = ReqStream.merge(shards)
    assert(java.util.Arrays.equals(merged.serialized, single.serialized),
      "shard merge must be bit-identical to the one-pass census")
    // quantile probe: rank 1 -> smallest bucket's midpoint (value 1)
    assert(ReqStream.quantileEstimate(merged, 1L) == 1L)
    val n = all.size.toLong
    val k = 999L * (n - 1L) / 1000L + 1L
    val exact = all.sorted.apply((k - 1L).toInt)
    val est = ReqStream.quantileEstimate(merged, k)
    assert(math.abs(est - exact) * 20L <= exact,
      s"p999 est $est vs exact $exact breaks the 5% guarantee")
  }

  // ---------------------------------------------------------------
  // q562 truncated dyadic SimRank
  // ---------------------------------------------------------------

  test("q562: 4-cycle — opposite corners converge to the hand value " +
      "344064/2^20 after 3 rounds, adjacent pairs stay 0") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val edges = und.++(und.map { case (a, b) => (b, a) }).toDF("u", "v")
    val out = graft.operators.SimRank.simrank(edges)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // s1(1,3) = 2·SCALE div 8 = 262144; s2 = (2·SCALE + 2·262144)
    // div 8 = 327680; s3 = (2·SCALE + 2·327680) div 8 = 344064
    assert(out == Seq((1L, 3L, 344064L), (2L, 4L, 344064L)),
      s"4-cycle SimRank drifted: $out")
  }

  test("q562: path 1-2-3 — the two leaves share their hub exactly, " +
      "s = SCALE div 2 at every round") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L))
    val edges = und.++(und.map { case (a, b) => (b, a) }).toDF("u", "v")
    val out = graft.operators.SimRank.simrank(edges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 524288L)), s"path SimRank drifted: $out")
  }

  // ---------------------------------------------------------------
  // q563 frequent 4-itemsets
  // ---------------------------------------------------------------

  test("q563: in-group C(n,4) generation + Apriori prune count hand " +
      "baskets correctly") {
    import spark.implicits._
    // baskets: o1 = {1,2,3,4}, o2 = {1,2,3,4,9}, o3 = {1,2,3,5},
    // o4 = {6} -> {1,2,3,4} support 2; every other quadruple support 1
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L), (2L, 9L),
      (3L, 1L), (3L, 2L), (3L, 3L), (3L, 5L),
      (4L, 6L)).toDF("l_orderkey", "l_partkey")
    val dirTmp = java.nio.file.Files
      .createTempDirectory("itemsets4").toString
    li.write.mode("overwrite").parquet(s"$dirTmp/li.parquet")
    // drive the combination machinery directly on the frame
    val op = li.distinct()
    val freq1 = op.groupBy($"l_partkey")
      .agg(count(lit(1)).as("df")).filter($"df" >= 2L)
      .select($"l_partkey")
    val out = op.join(freq1, Seq("l_partkey"), "left_semi")
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("ps"))
      .filter(size($"ps") >= 4)
      .select(explode(expr(
        """flatten(flatten(flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), (y, j) ->
          |    transform(slice(ps, i + j + 3, size(ps)), (z, k) ->
          |      transform(slice(ps, i + j + k + 4, size(ps)), t ->
          |        struct(x AS p1, y AS p2, z AS p3, t AS p4))))))))"""
          .stripMargin)).as("q"))
      .groupBy($"q.p1", $"q.p2", $"q.p3", $"q.p4")
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= 2L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L, 4L, 2L)),
      s"hand-basket quadruples drifted: $out")
  }

  // ---------------------------------------------------------------
  // q564 SMOTE
  // ---------------------------------------------------------------

  test("q564: minority selection, exact-cos NN, and doubled-midpoint " +
      "synthesis match the hand computation (incl. negative components)") {
    import spark.implicits._
    // minority = label 1 (2 rows vs 3); colinear positives -> cos
    // EXACTLY 1.0 (integer dot equals the product of integer norms)
    val rows = Seq(
      (1L, 1, Array(1.0f, 0.0f)), (2L, 1, Array(0.75f, 0.0f)),
      (10L, 2, Array(0.0f, 1.0f)), (11L, 2, Array(0.0f, 0.5f)),
      (12L, 2, Array(1.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val out = graft.llm.Smote.smote(rows).collect()
    assert(out.length == 2)
    val r1 = out.find(_.getAs[Long]("qid") == 1L).get
    assert(r1.getAs[Long]("nn_id") == 2L && r1.getAs[Int]("label") == 1)
    assert(r1.getAs[Double]("cos_sim") == 1.0)
    // q20(1.0)=1048576, q20(0.75)=786432 -> s2 = (1835008, 0)
    assert(r1.getAs[Long]("s2_sum") == 1835008L)
    assert(r1.getAs[Long]("s2_normsq") == 1835008L * 1835008L)
    // negative components: synthesis is pure integer ADDITION (no
    // floor-div-on-negatives anywhere) — q20(-0.5) = -524288
    val neg = Seq(
      (1L, 5, Array(-0.5f, 0.25f)), (2L, 5, Array(-0.5f, 0.25f)),
      (10L, 6, Array(1.0f, 0.0f)), (11L, 6, Array(0.0f, 1.0f)),
      (12L, 6, Array(1.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val n1 = graft.llm.Smote.smote(neg).collect()
      .find(_.getAs[Long]("qid") == 1L).get
    assert(n1.getAs[Long]("s2_sum") == 2L * (-524288L + 262144L))
    assert(n1.getAs[Long]("s2_normsq") ==
      4L * (524288L * 524288L + 262144L * 262144L))
  }

  // ---------------------------------------------------------------
  // q565 SSIM
  // ---------------------------------------------------------------

  test("q565: identical rasters give SSIM exactly 1.0, constant " +
      "rasters match the closed form, unequal dims are refused") {
    def ppm(w: Int, h: Int, px: Int => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      header ++ Array.tabulate(w * h * 3)(i => px(i).toByte)
    }
    val a = ppm(4, 3, i => (i * 13 + 5) % 256)
    val (n, sx, sy, sxx, syy, sxy) =
      graft.llm.Ssim.rasterMoments(a, a)
    assert(n == 36L && sx == sy && sxx == syy && sxx == sxy)
    // identical moments -> numerator == denominator term-for-term
    val mu = sx.toDouble / n
    val va = sxx.toDouble / n - mu * mu
    val ssim = (2.0 * mu * mu + 6.5025) * (2.0 * va + 58.5225) /
      ((mu * mu + mu * mu + 6.5025) * (va + va + 58.5225))
    assert(ssim == 1.0)
    // constant black vs constant white: sigma = 0 ->
    // SSIM = C1 / (255^2 + C1)
    val black = ppm(4, 3, _ => 0)
    val white = ppm(4, 3, _ => 255)
    val (n2, sx2, sy2, _, _, sxy2) =
      graft.llm.Ssim.rasterMoments(black, white)
    assert(n2 == 36L && sx2 == 0L && sy2 == 36L * 255L && sxy2 == 0L)
    val muY = sy2.toDouble / n2
    val hand = (2.0 * 0.0 * muY + 6.5025) * (2.0 * 0.0 + 58.5225) /
      ((0.0 + muY * muY + 6.5025) * (0.0 + 0.0 + 58.5225))
    assert(math.abs(hand - 6.5025 / (255.0 * 255.0 + 6.5025)) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.llm.Ssim.rasterMoments(a, ppm(5, 3, _ => 0))
    }
  }

  // ---------------------------------------------------------------
  // q566 adjusted Rand index
  // ---------------------------------------------------------------

  test("q566: ARI is exactly 1.0 for identical labelings, matches the " +
      "Hubert-Arabie hand value on a split, and NULLs on the " +
      "single-cluster degenerate") {
    import spark.implicits._
    val la = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L), (5L, 20L),
      (6L, 30L)).toDF("node", "label")
    val same = graft.operators.RandIndex.ari(la, la).collect().head
    assert(same.getAs[Double]("ari") == 1.0)
    assert(same.getAs[Long]("n") == 6L)
    // lb splits the 3-cluster {3,4,5} into {3,4} + {5}:
    // contingency nij pairs: C(2,2)=1 (10/10), C(2,2)=1 (20/x), rest 0
    // sum_nij = 1 + 1 = 2; sum_a = 1+3+0 = 4; sum_b = 1+1+0+0 = 2;
    // tot = 15; expected = 4*2/15; ARI = (2 - 8/15)/((4+2)/2 - 8/15)
    val lb = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 3L),
      (6L, 4L)).toDF("node", "label")
    val split = graft.operators.RandIndex.ari(la, lb).collect().head
    assert(split.getAs[Long]("sum_nij") == 2L &&
      split.getAs[Long]("sum_a") == 4L &&
      split.getAs[Long]("sum_b") == 2L && split.getAs[Long]("tot") == 15L)
    val hand = (2.0 - 4.0 * 2.0 / 15.0) / ((4.0 + 2.0) / 2.0 - 4.0 * 2.0 / 15.0)
    assert(math.abs(split.getAs[Double]("ari") - hand) < 1e-15)
    // both labelings one cluster: max index == expected index -> NULL
    val one = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("node", "label")
    val degen = graft.operators.RandIndex.ari(one, one).collect().head
    assert(degen.isNullAt(degen.fieldIndex("ari")),
      "single-cluster ARI must degrade to NULL, not divide by zero")
  }

  // ---------------------------------------------------------------
  // q568 Gorilla delta-of-delta cost
  // ---------------------------------------------------------------

  test("q568: constant and linear series hit the closed-form bit " +
      "costs (64 + tail of 1-bit dods; ramp pays one 12-bit delta)") {
    import spark.implicits._
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00")
    // constant series (n=5): 64 + (d=0 -> 1) + 3 x (dod=0 -> 1) = 68
    val const5 = (1 to 5).map(i => ("c", day(i), 42L))
      .toDF("event_type", "day", "x")
    // ramp +100/day (n=5): 64 + (d=100 -> 12) + 3 x (dod=0 -> 1) = 79
    val ramp5 = (1 to 5).map(i => ("r", day(i), 1000L + 100L * i))
      .toDF("event_type", "day", "x")
    val out = GorillaCost.gorillaBits(const5.unionAll(ramp5)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("total_bits"),
          r.getAs[Long]("raw_bits"))).toMap
    assert(out("c") == ((5L, 68L, 320L)), s"constant: ${out("c")}")
    assert(out("r") == ((5L, 79L, 320L)), s"ramp: ${out("r")}")
    // a wild jump pays the 68-bit escape exactly once
    val jump = (Seq(("j", day(1), 0L), ("j", day(2), 1000000L),
      ("j", day(3), 1000000L))).toDF("event_type", "day", "x")
    val j = GorillaCost.gorillaBits(jump).collect().head
    // 64 + (d=10^6 -> 68) + (dod=-10^6 -> 68) = 200
    assert(j.getAs[Long]("total_bits") == 200L)
  }

  // ---------------------------------------------------------------
  // qs28 DGIM sliding-window counting
  // ---------------------------------------------------------------

  test("qs28 state: DGIM buckets follow the hand cascade on all-ones, " +
      "the estimate stays inside the paper bound, serialization round-" +
      "trips, and expiry drops out-of-window buckets") {
    import graft.streaming.DgimStream
    val st = new DgimStream.DgimState
    (1 to 8).foreach(_ => st.update(true))
    // hand cascade (≤2 buckets per size, oldest pair merges):
    // [(8,1),(7,1),(6,2),(4,4)]
    assert(st.buckets == List((8L, 1L), (7L, 1L), (6L, 2L), (4L, 4L)),
      s"bucket cascade drifted: ${st.buckets}")
    // est = (1+1+2+4) - 4 + ceil(4/2) = 6; exact = 8; bound 8/2+1
    assert(st.estimate == 6L)
    assert(math.abs(st.estimate - 8L) <= 8L / 2L + 1L)
    // zeros advance the window without adding buckets
    st.update(false)
    assert(st.pos == 9L && st.buckets.size == 4)
    // round-trip
    val rt = DgimStream.deserialize(st.serialized)
    assert(rt.pos == st.pos && rt.buckets == st.buckets)
    // expiry with a tiny window: after 6 more zeros the size-4 bucket
    // (end 4) leaves a 10-wide window at pos 15
    val w10 = new DgimStream.DgimState(10L)
    (1 to 8).foreach(_ => w10.update(true))
    (1 to 7).foreach(_ => w10.update(false))
    assert(w10.pos == 15L)
    assert(!w10.buckets.exists(_._2 == 4L),
      s"out-of-window bucket survived: ${w10.buckets}")
    // estimate never exceeds the window's qualifying count bound:
    // remaining buckets end at 8,7,6 (sizes 1,1,2) -> est = 4 - 2 + 1
    assert(w10.estimate == 3L)
  }

  // ---------------------------------------------------------------
  // q567 Davies-Bouldin
  // ---------------------------------------------------------------

  test("q567: per-label worst-pair ratio runs and is positive on the " +
      "fixture partition, with scatter pieces exact") {
    val out = graft.llm.DaviesBouldin
      .q567DaviesBouldin(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n") >= 1L)
      assert(r.getAs[Long]("s_sum_micro") >= 0L)
      val rm = r.getAs[Double]("r_max")
      assert(rm > 0.0, s"R_i must be positive, got $rm")
    }
  }
}
