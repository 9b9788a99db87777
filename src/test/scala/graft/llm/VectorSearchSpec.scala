package graft.llm

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("lsh ann is deterministic and emits at most one row per query") {
    val a = VectorSearch.q45LshAnn(spark, dir)
      .select("qid", "nid").as[(Long, Long)].collect().toSeq
    val b = VectorSearch.q45LshAnn(spark, dir)
      .select("qid", "nid").as[(Long, Long)].collect().toSeq
    assert(a == b, "ANN result not deterministic across runs")
    assert(a.nonEmpty)
    assert(a.map(_._1).distinct.size == a.size, "duplicate qid rows")
  }

  test("srp buckets: deterministic, in range, dup vectors collide") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(5)
    val dup = e.withColumn("vec_id", $"vec_id" + 100000L)
    val both = e.unionByName(dup)
    (0 until VectorSearch.LshTables).foreach { t =>
      val buckets = both.select($"vec_id",
          srp_bucket($"embedding", VectorSearch.LshPlanesPerTable, 42 + t)
            .as("bucket"))
        .as[(Long, Long)].collect().toMap
      assert(buckets.values.forall(bk =>
        bk >= 0 && bk < (1L << VectorSearch.LshPlanesPerTable)))
      buckets.keys.filter(_ < 100000L).foreach { id =>
        assert(buckets(id) == buckets(id + 100000L),
          s"duplicate of $id hashed to a different bucket in table $t")
      }
    }
  }

  test("lsh ann finds planted exact duplicates (recall floor)") {
    // plant exact duplicates of 5 corpus vectors under fresh ids: each
    // dup collides with its original in EVERY table, so the ANN top-1
    // for the dup must be its original (cos_sim ≈ 1) unless a crowded
    // bucket capped one out — with 500 vecs over 4096 buckets it never is.
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val dup = e.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 100000L)
    val planted = e.unionByName(dup)
    val tmp = java.nio.file.Files.createTempDirectory("ann-recall")
    planted.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val top1 = VectorSearch.q45LshAnn(spark, tmp.toString)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(top1.get(id + 100000L).contains(id),
        s"planted dup ${id + 100000L} did not retrieve its original")
    }
  }

  test("ivf ann: deterministic, one row per query, finds planted dups") {
    val a = VectorSearch.q81IvfAnn(spark, dir)
      .select("qid", "nid").as[(Long, Long)].collect().toSeq
    val b = VectorSearch.q81IvfAnn(spark, dir)
      .select("qid", "nid").as[(Long, Long)].collect().toSeq
    assert(a == b, "IVF ANN not deterministic across runs")
    assert(a.nonEmpty)
    assert(a.map(_._1).distinct.size == a.size, "duplicate qid rows")
    // planted exact duplicates: same embedding → same top-1 cell, and
    // the probe set always contains the top-1 cell → dup is retrieved
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val dup = e.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 100000L)
    val tmp = java.nio.file.Files.createTempDirectory("ivf-recall")
    e.unionByName(dup).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val top1 = VectorSearch.q81IvfAnn(spark, tmp.toString)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(top1.get(id + 100000L).contains(id),
        s"planted dup ${id + 100000L} did not retrieve its original")
    }
  }

  test("brute-force topk: bounded query set, ranks contiguous") {
    val rows = VectorSearch.q44CosineTopk(spark, dir)
      .select("qid", "rank", "nid", "cos_sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, _, n, _) => q != n })
    // only the bounded query set emits rows — the corpus side streams
    assert(rows.forall(_._1 < VectorSearch.QuerySetSize))
    val byQ = rows.groupBy(_._1)
    assert(byQ.values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2, 3)))
    // scores non-increasing within a query
    assert(byQ.values.forall { rs =>
      val s = rs.sortBy(_._2).map(_._4)
      s.zip(s.tail).forall { case (x, y) => x >= y }
    })
  }

  test("broadcast-join centroid assignment equals the literal-expression form") {
    val e = graft.core.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val centroids = e.orderBy($"vec_id").limit(16)
      .select($"embedding").as[Array[Float]].collect().toSeq
    val viaExpr = VectorSearch.centroidCells(e, centroids)
      .as[(Long, Long)].collect().toMap
    val viaJoin = VectorSearch.centroidCellsJoin(e, centroids)
      .as[(Long, Long)].collect().toMap
    assert(viaExpr.nonEmpty && viaExpr == viaJoin,
      s"forms diverge on ${viaExpr.toSet.diff(viaJoin.toSet).take(5)}")
  }

  test("ivf index covers every corpus vector (no membership cap) at sf0.1") {
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = e.count()
    val cells = VectorSearch.ivfCellCount(n)
    val cb = VectorSearch.fitCodebook(e.select($"vec_id", $"embedding"), cells)
    val ranked = VectorSearch.ivfRanked(
      e.select($"vec_id", $"embedding", lit(1.0).as("norm")),
      cb, VectorSearch.ivfProbeCount(cb.size))
    val idx = ranked.filter($"crank" === 1).select($"vec_id", $"cell")
    assert(idx.count() == n, "index row count != corpus size")
    assert(idx.select($"vec_id").distinct().count() == n,
      "some corpus vector is missing from (or duplicated in) the index")
    // fitted codebook balances cells: every cell populated, and the
    // biggest cell stays within a small multiple of the mean
    val sizes = idx.groupBy($"cell").count()
      .select($"count").as[Long].collect()
    assert(sizes.length == cells, s"only ${sizes.length} of $cells cells used")
    assert(sizes.max <= 4 * (n / cells + 1),
      s"cell skew: max=${sizes.max} vs mean=${n / cells}")
  }

  test("ivf per-query candidate count is sublinear at sf0.1: ≤ probes·(2N/cells)") {
    // The scale contract of constant-probe IVF: candidates/query ≈
    // probes·N/cells (≈ probes·√N at √N cells), NOT a constant fraction
    // of the corpus. Asserted pre-cap, so this also proves the
    // IvfProbeCandidateCap is a degenerate-cell valve that never
    // engages in the fitted regime.
    val e = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = e.count()
    val cells = VectorSearch.ivfCellCount(n)
    val probes = VectorSearch.ivfProbeCount(cells)
    assert(probes == VectorSearch.IvfProbes,
      "probes must be the constant operating point, not cell-derived")
    val cb = VectorSearch.fitCodebook(e.select($"vec_id", $"embedding"), cells)
    val ranked = VectorSearch.ivfRanked(
      e.select($"vec_id", $"embedding", lit(1.0).as("norm")), cb, probes)
    val corpusSz = ranked.filter($"crank" === 1)
      .groupBy($"cell").agg(count(lit(1)).as("csz"))
    val perQuery = ranked.select($"vec_id", $"cell")
      .join(corpusSz, "cell")
      .groupBy($"vec_id").agg(sum($"csz").as("cand"))
      .select(max($"cand")).as[Long].head()
    val bound = probes.toLong * (2 * n / cells)
    assert(perQuery <= bound,
      s"worst query examines $perQuery candidates > bound $bound " +
        s"(probes=$probes cells=$cells n=$n)")
    assert(perQuery <= VectorSearch.IvfProbeCandidateCap,
      s"cap would engage in the non-degenerate regime: $perQuery")
  }

  test("codebook fit is deterministic across runs") {
    val e = graft.core.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val a = VectorSearch.fitCodebook(e, 23)
    val b = VectorSearch.fitCodebook(e, 23)
    assert(a.length == 23 && a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("ivfRanked join form (large codebooks) matches the expression form") {
    // force both forms over the SAME oversized codebook: 70 centroids >
    // IvfExprFormMaxCells routes ivfRanked to the broadcast-join path;
    // the expression form is reproduced through centroidCells (crank 1)
    val e = graft.core.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", lit(1.0).as("norm"))
    val cb = e.orderBy($"vec_id").limit(70)
      .select($"embedding").as[Array[Float]].collect().toSeq
    assert(cb.size > VectorSearch.IvfExprFormMaxCells)
    val viaJoin = VectorSearch.ivfRanked(e, cb, 1)
      .filter($"crank" === 1)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val viaExpr = VectorSearch.centroidCells(
      e.select($"vec_id", $"embedding"), cb)
      .as[(Long, Long)].collect().toMap
    assert(viaJoin.nonEmpty && viaJoin == viaExpr,
      s"forms diverge on ${viaJoin.toSet.diff(viaExpr.toSet).take(5)}")
  }

  test("nprobe recall curve: monotone, twin at ceiling, generic slopes up") {
    val (nq, recalls) = VectorSearch.probeCurveRecalls(spark, dir)
    info(recalls.map { case (p, t, g) => s"p$p twin=$t gen=$g" }.mkString(" "))
    assert(nq == VectorSearch.QuerySetSize)
    assert(recalls.map(_._1) == Seq(1L, 2L, 4L))
    recalls.sliding(2).foreach {
      case Seq((_, t1, g1), (_, t2, g2)) =>
        assert(t1 <= t2 && g1 <= g2, "curve must be monotone")
      case _ =>
    }
    assert(recalls.head._2 >= VectorSearch.ProbeCurveFloor1Permille)
    assert(recalls.last._3 >= VectorSearch.ProbeCurveFloor4Permille)
    // the generic curve must actually SLOPE on this corpus — a flat
    // reading would mean the probe prefix isn't widening candidates
    assert(recalls.last._3 > recalls.head._3,
      s"generic recall flat: ${recalls.map(_._3)}")
  }
}
