package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BEAM-SEARCH SERVING over the converged NN-Descent graph — the
  * query-time leg the graph-ANN family was missing: q439/q450 BUILD
  * the K'-NN graph, this ANSWERS nearest-neighbor queries by walking
  * it (greedy best-first with a beam, the HNSW/NSG serving motif):
  * start from hash-spread ENTRY nodes, repeatedly expand the current
  * beam's undirected neighbors, keep the best [[Beam]] nodes by exact
  * integer distance, answer with the best visited node.
  *
  * A flat K'-NN graph has no long links, so greedy walks need
  * ~√(n/entries) hops in 2-D — [[Entries]] spread entries and
  * [[Hops]] rounds cover the tested sizes; the production form is
  * HNSW's layer hierarchy (log-hop entry descent), which changes the
  * ENTRY policy, not this walk. The whole serve is batch-parallel:
  * every query advances one hop per round via one (beam ⋈ edges)
  * equi-join + one bounded top-k — queries never touch more than
  * beam·degree candidates per hop, the sublinear contract serving
  * exists for.
  *
  * Gate (the q86/q439 engine-internal convention): exact-truth top-1
  * (the full query×corpus scan the graph exists to avoid) vs the walk
  * answer, recall ≥ [[ServeRecallFloorPermille]] — measured 1000‰ at
  * sf0.001/sf0.01 and sf0.1 — plus build convergence. Distances are
  * exact BIGINTs on the q345 plane; ties break to the smaller node id
  * on BOTH sides.
  */
object GraphServe {
  private def ckpt(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.graftbridge.PlanBridge.checkpointResetStats(df)


  type Q = (SparkSession, String) => DataFrame

  val Entries = 32
  val Beam = 8
  val Hops = 10
  val QueryCount = 64
  /** Serving-graph degree cap (HNSW's M): the UNDIRECTED K'-NN graph
    * has bounded OUT-degree but unbounded IN-degree — a hub in a dense
    * region can sit in thousands of top-K' lists, and beams converge
    * exactly onto such hubs, so per-hop expansion grows without this
    * cap (measured: sf1 hops grew 0.7→127 s before the cap; constant
    * after). Per node, keep the M nearest undirected neighbors.
    */
  val MaxDegree = 24
  /** Pinned after measuring (1000‰ at every tested SF). */
  val ServeRecallFloorPermille = 900L

  /** The degree-capped serving graph as a persisted build-once table
    * (the r11 verdict's #2 ask: q456 must stop rebuilding the index it
    * serves): converged NN graph from the SHARED persisted build
    * ([[Dbscan.nndConvergedShared]]), then per node the M nearest
    * undirected neighbors by exact distance, saved via
    * [[graft.core.IndexStore]]. Returns (pts, graph table frame,
    * converged).
    */
  private[graft] def servingGraph(s: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Boolean) = {
    import s.implicits._
    val (pts, working, _, converged, _) = Dbscan.nndConvergedShared(s, dir)
    val t = graft.core.IndexStore.ensure(s, "serveg", dir) {
      val undirected = working.select($"a", $"b")
        .unionByName(working.select($"b".as("a"), $"a".as("b")))
        .distinct()
      // degree-bound the serving graph (see MaxDegree): per node, the
      // M nearest undirected neighbors by exact distance, bounded heap
      graft.plans.TopK.perGroup(
        undirected
          .join(pts.select($"vec_id".as("a"), $"x".as("ax"), $"y".as("ay")), "a")
          .join(pts.select($"vec_id".as("b"), $"x".as("bx"), $"y".as("by")), "b")
          .select($"a", $"b",
            (($"ax" - $"bx") * ($"ax" - $"bx") +
              ($"ay" - $"by") * ($"ay" - $"by")).as("d2")),
        Seq("a"), Seq("d2" -> true, "b" -> true), MaxDegree)
        .select($"a", $"b")
    }
    (pts, s.table(t), converged)
  }

  /** (n_queries, hits, recall‰, converged) — public for the spec. */
  /** The [[QueryCount]] benchmark queries (qid, qx, qy). */
  private[graft] def serveQueries(pts: DataFrame): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    pts.orderBy($"vec_id").limit(QueryCount)
      .select($"vec_id".as("qid"), $"x".as("qx"), $"y".as("qy"))
      .localCheckpoint()
  }

  /** Exact per-query distance of candidate (qid, node) pairs. */
  private[graft] def withDist(pts: DataFrame, queries: DataFrame)
      (cand: DataFrame): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    cand
      .join(pts.select($"vec_id".as("node"), $"x", $"y"), "node")
      .join(broadcast(queries), "qid")
      .filter($"node" =!= $"qid")
      .select($"qid", $"node",
        (($"x" - $"qx") * ($"x" - $"qx") +
          ($"y" - $"qy") * ($"y" - $"qy")).as("d2"))
  }

  /** Exact top-1 truth: the full query×corpus scan the graph avoids. */
  private[graft] def exactTruth(pts: DataFrame, queries: DataFrame)
      : DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    graft.plans.TopK.perGroup(
      withDist(pts, queries)(pts.select($"vec_id".as("node"))
        .crossJoin(broadcast(queries.select($"qid")))),
      Seq("qid"), Seq("d2" -> true, "node" -> true), 1)
      .select($"qid", $"node".as("t_node"))
  }

  /** The batch beam walk: advance every query `hops` rounds over
    * `graph` (a, b edges) from `startBeam` (qid, node, d2), keeping
    * the best `beamWidth` visited nodes per query — one (beam ⋈
    * edges) equi-join + one bounded top-k per hop, shared by the flat
    * q456 serve and q470's per-layer descents.
    */
  private[graft] def walk(pts: DataFrame, queries: DataFrame,
      graph: DataFrame, startBeam: DataFrame, beamWidth: Int,
      hops: Int): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    val wd = withDist(pts, queries) _
    var beam = startBeam
    var h = 0
    while (h < hops) {
      val expanded = beam.select($"qid", $"node".as("a"))
        .join(graph, "a")
        .select($"qid", $"b".as("node"))
      val all = wd(expanded)
        .unionByName(beam.select($"qid", $"node", $"d2"))
        .groupBy($"qid", $"node").agg(min($"d2").as("d2"))
      beam = ckpt(graft.plans.TopK.perGroup(all,
        Seq("qid"), Seq("d2" -> true, "node" -> true), beamWidth))
      h += 1
    }
    beam
  }

  /** Top-1 answer per query from a final beam. */
  private[graft] def beamAnswer(beam: DataFrame): DataFrame = {
    val s = beam.sparkSession
    import s.implicits._
    graft.plans.TopK.perGroup(beam,
      Seq("qid"), Seq("d2" -> true, "node" -> true), 1)
      .select($"qid", $"node".as("a_node"))
  }

  def serveStats(s: SparkSession, dir: String): (Long, Long, Long, Boolean) = {
    import s.implicits._
    val (pts, graphCp, converged) = servingGraph(s, dir)
    val queries = serveQueries(pts)
    val nq = queries.count()
    val truth = exactTruth(pts, queries)
    // hash-spread entries, same for every query
    val entries = pts.select($"vec_id".as("node"))
      .orderBy(xxhash64($"node"), $"node").limit(Entries)
    val beam0 = ckpt(graft.plans.TopK.perGroup(
      withDist(pts, queries)(
        queries.select($"qid").crossJoin(broadcast(entries))),
      Seq("qid"), Seq("d2" -> true, "node" -> true), Beam))
    val beam = walk(pts, queries, graphCp, beam0, Beam, Hops)
    val answer = beamAnswer(beam)
    val hits = answer.join(truth, "qid")
      .filter($"a_node" === $"t_node").count()
    val recall = if (nq == 0) 0L else 1000L * hits / nq
    (nq, hits, recall, converged)
  }

  /** q456 — the serving gate. */
  val q456GraphServe: Q = (s, dir) => {
    import s.implicits._
    val (nq, _, recall, converged) = serveStats(s, dir)
    val ok = converged && recall >= ServeRecallFloorPermille
    Seq((nq, ok)).toDF("n_queries", "ok")
  }

  val q456Sql: String =
    s"""SELECT CAST(LEAST($QueryCount, COUNT(*)) AS BIGINT) AS n_queries,
       |  TRUE AS ok
       |FROM embeddings""".stripMargin

  val queries: Map[String, Q] = Map(
    "q456_graph_serve" -> q456GraphServe)
  val oracleSql: Map[String, String] = Map(
    "q456_graph_serve" -> q456Sql)
}
