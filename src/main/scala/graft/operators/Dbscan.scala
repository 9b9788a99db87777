package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Grid-accelerated DBSCAN (Ester, Kriegel, Sander & Xu, KDD'96) over
  * the embedding table's first two coordinates — DENSITY clustering,
  * the family member the repo's others can't express: k-means (q234)
  * partitions everything into convex cells, LPA (q239) needs an edge
  * list, DBSCAN discovers arbitrary-shape dense regions AND labels
  * sparse points as noise (the outlier-aware clustering a curation
  * pipeline uses to find coherent embedding regions vs stragglers).
  *
  * Exact semantics, integer-quantized: coordinates are ⌊1000·e⌋,
  * neighborhood is dx²+dy² ≤ [[DbEps]]² in pure BIGINT arithmetic; a
  * point is CORE iff its closed neighborhood has ≥ [[DbMinPts]]
  * points; clusters are connected components of the core-core
  * neighbor graph labeled by min vec_id ([[ConnectedComponents]]);
  * border points adopt the smallest core-neighbor label; everything
  * else is noise (cluster −1). Every rule is integer-exact, so the
  * per-point output hash-compares against a brute-force O(n²) oracle.
  *
  * Scale shape: the neighbor join is the 3×3 GRID join (cell = eps
  * floor-division; any pair within eps differs by ≤1 cell per axis —
  * candidate completeness by construction), so pair work is bounded
  * by local density, never n² — the q297 spatial-join discipline; the
  * oracle does the quadratic join the grid exists to avoid. CC is the
  * q101 label-propagation fixpoint (O(log n) rounds of equi-joins).
  */
object Dbscan {

  type Q = (SparkSession, String) => DataFrame

  val DbScale = 1000
  val DbEps = 30L
  val DbMinPts = 5L

  val q340Dbscan: Q = (s, dir) => {
    import s.implicits._
    val pts = T.embeddings(s, dir)
      .select($"vec_id",
        expr(s"CAST(FLOOR($DbScale * embedding[0]) AS BIGINT)").as("x"),
        expr(s"CAST(FLOOR($DbScale * embedding[1]) AS BIGINT)").as("y"))
      .localCheckpoint()
    cluster(pts, DbEps, DbMinPts)
  }

  /** DBSCAN over any (vec_id, x, y) integer point frame — the full
    * pipeline, shared with the spec's hand layouts. */
  def cluster(pts: DataFrame, eps: Long, minPts: Long): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    val withCell = pts
      .withColumn("cx", expr(s"x div $eps"))
      .withColumn("cy", expr(s"y div $eps"))
    val probe = withCell.select($"vec_id".as("a"), $"x".as("ax"),
        $"y".as("ay"),
        explode(expr("""transform(sequence(-1, 1), dx -> dx)""")).as("dx"),
        $"cx", $"cy")
      .select($"a", $"ax", $"ay", ($"cx" + $"dx").as("jx"),
        explode(expr("""transform(sequence(-1, 1), dy -> dy)""")).as("dy"),
        $"cy")
      .select($"a", $"ax", $"ay", $"jx", ($"cy" + $"dy").as("jy"))
    val nbr = probe.join(
        withCell.select($"vec_id".as("b"), $"x".as("bx"), $"y".as("by"),
          $"cx".as("jx"), $"cy".as("jy")),
        Seq("jx", "jy"))
      .filter($"a" =!= $"b" &&
        ($"ax" - $"bx") * ($"ax" - $"bx") +
          ($"ay" - $"by") * ($"ay" - $"by") <= eps * eps)
      .select($"a", $"b")
      .localCheckpoint()
    val core = nbr.groupBy($"a").agg(count(lit(1)).as("deg"))
      .filter($"deg" + 1 >= minPts)
      .select($"a".as("vec_id"))
      .localCheckpoint()
    val coreEdges = nbr
      .join(core.select($"vec_id".as("a")), "a")
      .join(core.select($"vec_id".as("b")), "b")
      .filter($"a" < $"b")
    val comps = ConnectedComponents(coreEdges, src = "a", dst = "b")
      .select($"id".as("vec_id"), $"comp")
    // isolated core points (no core neighbor) are their own cluster
    val coreLabeled = core.join(comps, Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"comp", $"vec_id").as("cluster"))
      .localCheckpoint()
    val borderLabeled = nbr
      .join(core.select($"vec_id".as("a")), Seq("a"), "left_anti")
      .join(coreLabeled.select($"vec_id".as("b"), $"cluster"), "b")
      .groupBy($"a".as("vec_id"))
      .agg(min($"cluster").as("cluster"))
    val labeled = coreLabeled.withColumn("role", lit("core"))
      .unionByName(borderLabeled.withColumn("role", lit("border")))
    pts.select($"vec_id").join(labeled, Seq("vec_id"), "left")
      .select($"vec_id",
        coalesce($"role", lit("noise")).as("role"),
        coalesce($"cluster", lit(-1L)).as("cluster"))
      .orderBy($"vec_id")
  }

  /** Brute-force oracle: quadratic neighbor join + reachability-closure
    * min labels — exactly the work the grid and the CC fixpoint avoid.
    */
  val q340Sql: String =
    s"""WITH RECURSIVE pts AS (
       |  SELECT vec_id,
       |    CAST(FLOOR($DbScale * embedding[1]) AS BIGINT) AS x,
       |    CAST(FLOOR($DbScale * embedding[2]) AS BIGINT) AS y
       |  FROM embeddings),
       |nbr AS (
       |  SELECT p.vec_id AS a, q.vec_id AS b
       |  FROM pts p JOIN pts q ON p.vec_id <> q.vec_id
       |    AND (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)
       |        <= ${DbEps * DbEps}),
       |core AS (
       |  SELECT a AS vec_id FROM nbr GROUP BY a
       |  HAVING COUNT(*) + 1 >= $DbMinPts),
       |ce AS (
       |  SELECT n.a, n.b FROM nbr n
       |  JOIN core ca ON n.a = ca.vec_id
       |  JOIN core cb ON n.b = cb.vec_id),
       |walk AS (
       |  SELECT vec_id AS node, vec_id AS lbl FROM core
       |  UNION
       |  SELECT ce.b, w.lbl FROM walk w JOIN ce ON ce.a = w.node),
       |comp AS (SELECT node AS vec_id, MIN(lbl) AS cluster
       |         FROM walk GROUP BY node),
       |border AS (
       |  SELECT n.a AS vec_id, MIN(c.cluster) AS cluster
       |  FROM nbr n
       |  JOIN comp c ON n.b = c.vec_id
       |  WHERE n.a NOT IN (SELECT vec_id FROM core)
       |  GROUP BY n.a),
       |lab AS (
       |  SELECT vec_id, 'core' AS role, cluster FROM comp
       |  UNION ALL
       |  SELECT vec_id, 'border', cluster FROM border)
       |SELECT p.vec_id,
       |  COALESCE(l.role, 'noise') AS role,
       |  CAST(COALESCE(l.cluster, -1) AS BIGINT) AS cluster
       |FROM pts p LEFT JOIN lab l ON p.vec_id = l.vec_id
       |ORDER BY p.vec_id""".stripMargin


  /** q345 — radius-bounded exact kNN GRAPH (k = [[KnnK]] nearest
    * neighbors within [[DbEps]]) over the same quantized plane — the
    * construction primitive of graph-based similarity methods
    * (mutual-kNN clustering, NN-Descent/HNSW seeding) and the
    * all-points sibling of q44's query-set top-k and q297's 1-NN
    * join. Distances are exact BIGINT squares; ranking ties break
    * (d², neighbor id) — fully ordered, so the edge list hash-compares
    * against the brute-force oracle.
    *
    * Scale shape: the 3×3 grid join bounds candidates by local
    * density (radius-bounded kNN is exactly what makes the grid
    * COMPLETE — an unbounded k-th neighbor can live arbitrarily far);
    * per-point selection runs on [[graft.plans.TopKPerGroupExec]]'s
    * bounded heap, not a window sort. The oracle is the quadratic
    * join + window the grid and the heap avoid.
    */
  val KnnK = 5

  val q345KnnGraph: Q = (s, dir) => {
    import s.implicits._
    val pts = T.embeddings(s, dir)
      .select($"vec_id",
        expr(s"CAST(FLOOR($DbScale * embedding[0]) AS BIGINT)").as("x"),
        expr(s"CAST(FLOOR($DbScale * embedding[1]) AS BIGINT)").as("y"))
      .localCheckpoint()
    val withCell = pts
      .withColumn("cx", expr(s"x div $DbEps"))
      .withColumn("cy", expr(s"y div $DbEps"))
    val probe = withCell.select($"vec_id".as("a"), $"x".as("ax"),
        $"y".as("ay"),
        explode(expr("transform(sequence(-1, 1), dx -> dx)")).as("dx"),
        $"cx", $"cy")
      .select($"a", $"ax", $"ay", ($"cx" + $"dx").as("jx"),
        explode(expr("transform(sequence(-1, 1), dy -> dy)")).as("dy"),
        $"cy")
      .select($"a", $"ax", $"ay", $"jx", ($"cy" + $"dy").as("jy"))
    val cand = probe.join(
        withCell.select($"vec_id".as("b"), $"x".as("bx"), $"y".as("by"),
          $"cx".as("jx"), $"cy".as("jy")),
        Seq("jx", "jy"))
      .filter($"a" =!= $"b")
      .withColumn("d2",
        ($"ax" - $"bx") * ($"ax" - $"bx") +
          ($"ay" - $"by") * ($"ay" - $"by"))
      .filter($"d2" <= DbEps * DbEps)
      .select($"a", $"b", $"d2")
    graft.plans.TopK.perGroup(cand, Seq("a"),
        Seq("d2" -> true, "b" -> true), KnnK)
      .orderBy($"a", $"d2", $"b")
  }

  val q345Sql: String =
    s"""WITH pts AS (
       |  SELECT vec_id,
       |    CAST(FLOOR($DbScale * embedding[1]) AS BIGINT) AS x,
       |    CAST(FLOOR($DbScale * embedding[2]) AS BIGINT) AS y
       |  FROM embeddings),
       |cand AS (
       |  SELECT p.vec_id AS a, q.vec_id AS b,
       |    (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d2
       |  FROM pts p JOIN pts q ON p.vec_id <> q.vec_id),
       |rk AS (
       |  SELECT a, b, CAST(d2 AS BIGINT) AS d2,
       |    ROW_NUMBER() OVER (PARTITION BY a ORDER BY d2, b) AS r
       |  FROM cand WHERE d2 <= ${DbEps * DbEps})
       |SELECT a, b, d2 FROM rk WHERE r <= $KnnK
       |ORDER BY a, d2, b""".stripMargin

  /** q439 gate floor, permille — pinned after measuring (target-k
    * seed recall 45‰ sf0.001 / 31‰ sf0.01; after ONE round at working
    * width K'=20: 174‰ / 138‰ — a 4–4.5× lift from a single
    * neighbor-of-neighbor pass; further rounds would close the rest,
    * the paper's convergence claim).
    */
  val NndAfterFloorPermille = 80L

  /** Working width K' of the seed/working graph (the paper
    * over-provisions K' ≫ target k; the 2-hop frontier scales K'²).
    */
  val NndSeedK = 20

  /** All q439 numbers: (n_nodes, n_exact_edges, seed recall‰,
    * after-one-round recall‰) — public for the spec and the probe.
    */
  def nndStats(s: SparkSession, dir: String,
      rounds: Int = 1): (Long, Long, Long, Long) = {
    import s.implicits._
    val pts = T.embeddings(s, dir)
      .select($"vec_id",
        expr(s"CAST(FLOOR($DbScale * embedding[0]) AS BIGINT)").as("x"),
        expr(s"CAST(FLOOR($DbScale * embedding[1]) AS BIGINT)").as("y"))
      .localCheckpoint()
    val n = pts.count()
    // hash-ring seed graph: each node's K successors in xxhash order —
    // deterministic, geometry-blind (hash order is arbitrary w.r.t.
    // the plane), the "random initial graph" NN-Descent starts from
    val wRing = org.apache.spark.sql.expressions.Window
      .orderBy(xxhash64($"vec_id"), $"vec_id")
    val ring = pts.select($"vec_id")
      .withColumn("pos", row_number().over(wRing).cast("long") - 1L)
      .localCheckpoint()
    val succ = (1 to NndSeedK).map(i => ring.select($"vec_id".as("a"),
        (($"pos" + i) % n).as("spos")))
      .reduce(_ unionByName _)
    val seedEdges = succ
      .join(ring.select($"vec_id".as("b"), $"pos".as("spos")), "spos")
      .select($"a", $"b").filter($"a" =!= $"b")
    def topkByDist(e: DataFrame, k: Int): DataFrame = {
      val d = e
        .join(pts.select($"vec_id".as("a"), $"x".as("ax"), $"y".as("ay")), "a")
        .join(pts.select($"vec_id".as("b"), $"x".as("bx"), $"y".as("by")), "b")
        .withColumn("d2",
          ($"ax" - $"bx") * ($"ax" - $"bx") +
            ($"ay" - $"by") * ($"ay" - $"by"))
        .select($"a", $"b", $"d2")
      graft.plans.TopK.perGroup(d, Seq("a"),
        Seq("d2" -> true, "b" -> true), k)
        .select(col("a"), col("b"))
    }
    // working graph at the WORKING width K' = NndSeedK (the paper
    // over-provisions the working K relative to the target k — the
    // 2-hop frontier is what drives convergence), final answer at KnnK
    var working = topkByDist(seedEdges, NndSeedK).localCheckpoint()
    // `rounds` NN-Descent rounds (Dong et al. 2011), default ONE:
    // candidates = current edges ∪ two-hop paths through the
    // UNDIRECTED current graph (forward and reverse neighbors both
    // generalize — the paper's general-neighbor set). Extra rounds are
    // the convergence knob the sf1 appendix validates.
    var r = 0
    while (r < rounds) {
      val undirected = working
        .unionByName(working.select($"b".as("a"), $"a".as("b")))
        .distinct().localCheckpoint()
      val cand = undirected.as("e1")
        .join(undirected.as("e2"), $"e1.b" === $"e2.a")
        .select($"e1.a".as("a"), $"e2.b".as("b"))
        .filter($"a" =!= $"b")
        .unionByName(working)
        .distinct()
      working = topkByDist(cand, NndSeedK).localCheckpoint()
      r += 1
    }
    val afterTop = graft.plans.TopK.perGroup(
      working
        .join(pts.select($"vec_id".as("a"), $"x".as("ax"), $"y".as("ay")), "a")
        .join(pts.select($"vec_id".as("b"), $"x".as("bx"), $"y".as("by")), "b")
        .withColumn("d2",
          ($"ax" - $"bx") * ($"ax" - $"bx") +
            ($"ay" - $"by") * ($"ay" - $"by"))
        .select($"a", $"b", $"d2"),
      Seq("a"), Seq("d2" -> true, "b" -> true), KnnK)
      .select(col("a"), col("b"))
    val exact = q345KnnGraph(s, dir).select($"a", $"b").localCheckpoint()
    val nExact = exact.count()
    def recall(g: DataFrame): Long =
      if (nExact == 0) 0L
      else 1000L * g.join(exact, Seq("a", "b"), "left_semi").count() / nExact
    (n, nExact, recall(topkByDist(seedEdges, KnnK)), recall(afterTop))
  }

  /** q439 — one NN-DESCENT round (Dong, Moses & Li WWW'11) over a
    * hash-ring seed graph, gated on RECALL IMPROVEMENT vs the exact
    * radius-bounded kNN graph (q345): the graph-ANN leg of the index
    * family — IVF partitions the space (q81/q86/q435), LSH buckets it
    * (q45/q85), NN-Descent instead refines a cheap wrong graph by
    * exploring neighbors-of-neighbors, converging because "a neighbor
    * of a neighbor is likely a neighbor". One round lifts recall
    * 4–4.5× here (see [[NndAfterFloorPermille]]); the gate demands
    * after > seed AND after ≥ floor, both readings exact-integer rank
    * arithmetic on the q345 plane.
    *
    * The floor is pinned to the TESTED SFs (the q345-eps discipline):
    * at fixed working width, one round's 2-hop frontier covers a
    * SHRINKING fraction of a growing graph, so one-round recall
    * decays with n — measured 42‰ at sf0.1 (2k nodes) and 4‰ on the
    * ×100 sf1 slice (20k nodes, 10× eps-density). The knob is MORE
    * ROUNDS (`nndStats(_, _, rounds)`): recall roughly DOUBLES per
    * round everywhere measured (sf0.1: 42→78→144‰; sf1: 4→7→14‰) —
    * the paper's run-to-convergence contract, validated in the
    * BASELINE.md sf1 appendix.
    *
    * Scale shape: the candidate set is |E|²/n per node (K²·4 pairs) —
    * linear in nodes for fixed K; distances are exact BIGINTs; per-a
    * selection on the bounded TopK heap. The ring seed's one global
    * hash-order window is the SF-bounded convenience form — at 100 TB
    * the seed comes from zipWithIndex rings per partition, same
    * geometry-blindness, no global sort.
    */
  val q439NnDescent: Q = (s, dir) => {
    import s.implicits._
    val (n, nExact, seedR, afterR) = nndStats(s, dir)
    val ok = afterR > seedR && afterR >= NndAfterFloorPermille
    Seq((n, nExact, ok)).toDF("n_nodes", "n_exact_edges", "ok")
  }

  val q439Sql: String =
    s"""WITH pts AS (
       |  SELECT vec_id,
       |    CAST(FLOOR($DbScale * embedding[1]) AS BIGINT) AS x,
       |    CAST(FLOOR($DbScale * embedding[2]) AS BIGINT) AS y
       |  FROM embeddings),
       |cand AS (
       |  SELECT p.vec_id AS a, q.vec_id AS b,
       |    (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d2
       |  FROM pts p JOIN pts q ON p.vec_id <> q.vec_id),
       |rk AS (
       |  SELECT a, b,
       |    ROW_NUMBER() OVER (PARTITION BY a ORDER BY d2, b) AS r
       |  FROM cand WHERE d2 <= ${DbEps * DbEps})
       |SELECT (SELECT COUNT(*) FROM pts) AS n_nodes,
       |  CAST(COUNT(*) AS BIGINT) AS n_exact_edges, TRUE AS ok
       |FROM rk WHERE r <= $KnnK""".stripMargin

  val queries: Map[String, Q] = Map(
    "q340_dbscan" -> q340Dbscan,
    "q345_knn_graph" -> q345KnnGraph,
    "q439_nn_descent" -> q439NnDescent)
  val oracleSql: Map[String, String] = Map(
    "q340_dbscan" -> q340Sql,
    "q345_knn_graph" -> q345Sql,
    "q439_nn_descent" -> q439Sql)
}
