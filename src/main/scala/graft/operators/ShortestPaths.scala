package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Bounded-hop weighted single-source shortest paths (Bellman–Ford) —
  * the MIN-PLUS semiring fixpoint that completes the iterative-graph
  * family: [[ConnectedComponents]] is the boolean (reachability)
  * semiring, [[PageRank]] the sum-product one, and q188's recursive CTE
  * the engine-driven unweighted special case. Distances use ≤
  * [[ShortestPaths.Hops]] edges — the bounded-round form every
  * distributed BF implementation ships (Pregel supersteps), and the
  * only form with a terminating exact SQL oracle.
  *
  * Graph: the gear-family co-purchase subgraph (q188's), with edge
  * weight = number of distinct co-purchasing orders — integer, exact,
  * and deterministic, so every relaxed distance is a BIGINT sum and the
  * whole fixpoint hash-compares with DuckDB bit-for-bit (no float path
  * costs). The co-purchase self-join is symmetric, so the edge list is
  * already undirected — no mirroring step.
  *
  * Scale shape (the Pregel plan, spelled in DataFrames): the edge list
  * is computed ONCE and localCheckpoint'ed; each round is ONE equi-join
  * (current distances ⋈ edges on the node id — the same hash
  * partitioning every round, so AQE reuses the exchange) + ONE
  * partial-aggregated MIN groupBy. Per-round driver traffic is zero;
  * rounds are a compile-time constant. The working set stays one row
  * per REACHED node (min distance so far), never a path multiset — the
  * frontier can't explode combinatorially the way the oracle's
  * path-enumerating CTE would without its UNION dedup.
  *
  * Reference anchor: none — the reference's graph is a directory tree
  * walked one level per request (main.go:143-238); transitive shortest
  * reach over a data-defined graph is a north-star [N] row.
  */
object ShortestPaths {

  type Q = (SparkSession, String) => DataFrame

  val Hops = 3

  /** Bounded-hop Bellman–Ford: `edges` is (u, v, w BIGINT); returns
    * (node, dist) for every node reachable from `src` in ≤ `hops`
    * edges, `dist` = min total weight over such paths. Pass a
    * MATERIALIZED edge frame (localCheckpoint) — it is joined once per
    * round and must not recompute.
    */
  def boundedSssp(edges: DataFrame, src: Long, hops: Int = Hops): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val ed = edges.select($"u", $"v", $"w")
    var dist = Seq((src, 0L)).toDF("node", "dist")
    for (_ <- 1 to hops) {
      val relaxed = dist.join(ed, dist("node") === ed("u"))
        .select(ed("v").as("node"), (dist("dist") + ed("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .localCheckpoint() // cut the lineage; each round is one join+agg
    }
    dist
  }

  /** q231 — weighted SSSP over the gear-family co-purchase graph from
    * its smallest part key, distances exact over ≤ [[Hops]] edges.
    */
  val q231Sssp: Q = (s, dir) => {
    import s.implicits._
    val gl = T.lineitem(s, dir)
      .join(T.part(s, dir), $"l_partkey" === $"p_partkey")
      .filter($"p_name".like("%gear%"))
      .select($"l_orderkey", $"l_partkey")
    val edges = gl.as("a").join(gl.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_partkey" =!= $"b.l_partkey")
      .groupBy($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .agg(countDistinct($"a.l_orderkey").as("w"))
      .localCheckpoint() // computed once; every BF round re-joins it
    val src = edges.agg(min($"u")).head().getLong(0) // 1 scalar, bounded
    boundedSssp(edges, src)
      .select($"node", $"dist")
      .orderBy($"node")
  }

  val q231Sql: String =
    s"""WITH gl AS (
       |  SELECT l_orderkey, l_partkey FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  WHERE p_name LIKE '%gear%'),
       |ed AS (
       |  SELECT a.l_partkey AS u, b.l_partkey AS v,
       |         COUNT(DISTINCT a.l_orderkey) AS w
       |  FROM gl a JOIN gl b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
       |  GROUP BY 1, 2),
       |src AS (SELECT MIN(u) AS s FROM ed),
       |walk AS (
       |  WITH RECURSIVE walk(node, d, hops) AS (
       |    SELECT s, CAST(0 AS BIGINT), 0 FROM src
       |    UNION
       |    SELECT e.v, walk.d + e.w, walk.hops + 1
       |    FROM walk JOIN ed e ON e.u = walk.node
       |    WHERE walk.hops < $Hops)
       |  SELECT node, d FROM walk)
       |SELECT node, CAST(MIN(d) AS BIGINT) AS dist
       |FROM walk GROUP BY node
       |ORDER BY node""".stripMargin

  val queries: Map[String, Q] = Map("q231_weighted_sssp" -> q231Sssp)
  val oracleSql: Map[String, String] = Map("q231_weighted_sssp" -> q231Sql)
}
