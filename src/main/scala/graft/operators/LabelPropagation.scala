package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Synchronous label-propagation COMMUNITY detection (Raghavan et al.
  * 2007) — the density-structure sibling of the connectivity fixpoints:
  * [[ConnectedComponents]] answers "which nodes can reach each other at
  * all", LPA answers "which nodes cluster together", converging to
  * dense groups even inside one giant connected component (every
  * co-purchase graph is one component; its COMMUNITIES are the signal).
  *
  * Determinism contract (what makes 3 engine-independent rounds
  * hash-comparable): rounds are SYNCHRONOUS (all nodes update from the
  * same previous labeling — asynchronous LPA is order-dependent by
  * construction), the vote is the exact integer count of neighbor
  * labels, and ties break to the smallest label. Fixed round count
  * rather than convergence detection, the q138/q231 bounded-fixpoint
  * convention that keeps the SQL oracle terminating and exact.
  *
  * Scale shape (Pregel spelled in DataFrames): edges localCheckpoint'ed
  * once; each round is ONE equi-join (labels ⋈ edges on the node id —
  * the same hash partitioning every round) + TWO partial-aggregated
  * groupBys on node keys (vote counts, then the min-struct argmax).
  * Zero driver traffic per round; working set is one row per node.
  */
object LabelPropagation {

  type Q = (SparkSession, String) => DataFrame

  val Rounds = 3

  /** `edges` is a symmetric (u, v) frame (pass it MATERIALIZED — it is
    * re-joined every round); returns (node, community) after [[Rounds]]
    * synchronous votes from labels(node) = node.
    */
  def propagate(edges: DataFrame, rounds: Int = Rounds): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    var labels = edges.select($"u".as("node")).distinct()
      .withColumn("label", $"node")
    for (_ <- 1 to rounds) {
      val votes = edges
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy($"u", $"label").agg(count(lit(1)).as("n"))
      labels = votes
        .groupBy($"u".as("node"))
        .agg(min(struct((-$"n").as("nn"), $"label".as("l")))
          .getField("l").as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** q239 — communities of the gear-family co-purchase graph (q231's
    * symmetric edge list, unweighted votes), with per-community size
    * attached to every node row.
    */
  val q239Communities: Q = (s, dir) => {
    import s.implicits._
    val gl = T.lineitem(s, dir)
      .join(T.part(s, dir), $"l_partkey" === $"p_partkey")
      .filter($"p_name".like("%gear%"))
      .select($"l_orderkey", $"l_partkey")
    val edges = gl.as("a").join(gl.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_partkey" =!= $"b.l_partkey")
      .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
      .distinct()
      .localCheckpoint()
    val labels = propagate(edges)
    val sizes = labels.groupBy($"label").agg(count(lit(1)).as("community_n"))
    labels.join(sizes, "label")
      .select($"node", $"label".as("community"), $"community_n")
      .orderBy($"node")
  }

  val q239Sql: String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT u AS node, label FROM (
         |    SELECT e.u, l.label, COUNT(*) AS n,
         |      row_number() OVER (PARTITION BY e.u
         |        ORDER BY COUNT(*) DESC, l.label ASC) AS rn
         |    FROM ed e JOIN $prev l ON e.v = l.node
         |    GROUP BY e.u, l.label) q
         |  WHERE rn = 1)""".stripMargin
    s"""WITH gl AS (
       |  SELECT l_orderkey, l_partkey FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  WHERE p_name LIKE '%gear%'),
       |ed AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM gl a JOIN gl b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |l0 AS (SELECT DISTINCT u AS node, u AS label FROM ed),
       |${round("l0", "l1")},
       |${round("l1", "l2")},
       |${round("l2", "l3")},
       |sizes AS (SELECT label, COUNT(*) AS community_n FROM l3 GROUP BY label)
       |SELECT node, l3.label AS community, community_n
       |FROM l3 JOIN sizes ON l3.label = sizes.label
       |ORDER BY node""".stripMargin
  }

  val queries: Map[String, Q] = Map("q239_lpa_communities" -> q239Communities)
  val oracleSql: Map[String, String] = Map("q239_lpa_communities" -> q239Sql)
}
