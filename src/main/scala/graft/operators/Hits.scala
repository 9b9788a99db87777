package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg JACM'99) on the bipartite
  * customer×part co-purchase graph — the query-independent importance
  * pairing PageRank (q138/q474) computes for unipartite graphs:
  * customers are HUBS (a good hub buys authoritative parts), parts are
  * AUTHORITIES (a good authority is bought by good hubs). The mutual
  * recursion auth ← Σ hub(neighbors), hub ← Σ auth(neighbors) runs
  * [[HitsRounds]] rounds in EXACT integer arithmetic — the usual L2
  * normalization only rescales, so rankings (the operator's output)
  * are identical without it, and skipping it keeps every engine
  * bit-exact: values grow by ≤ (max_deg_c · cap)^t ≈ 1760³ ≈ 5.5·10⁹,
  * far inside int64 (the same unnormalized-fixed-point discipline as
  * q474's personalized PageRank).
  *
  * Graph: [[ButterflyCount.cappedEdges]] — the support cap doubles as
  * the authority-side degree bound that keeps the growth certificate
  * valid at any SF.
  *
  * Scale shape: each half-step is ONE keyed equi-join of the edge list
  * against the current score frame + one partial agg — 2·rounds
  * shuffles of |E| rows, no per-node driver work; the oracle replays
  * all six half-steps as UNROLLED MATERIALIZED CTEs (the q474/q496
  * replay discipline), so the top-10 authority scores are FULL-VALUE
  * checked.
  */
object Hits {

  type Q = (SparkSession, String) => DataFrame

  val HitsRounds = 3
  val HitsTop = 10

  val q504Hits: Q = (s, dir) => {
    import s.implicits._
    val e = ButterflyCount.cappedEdges(s, dir).localCheckpoint()
    // hub⁰ = 1 for every customer ⟹ auth¹ = part degree
    var auth = e.groupBy($"p").agg(count(lit(1)).as("a"))
    var hub: DataFrame = null
    for (_ <- 1 until HitsRounds) {
      hub = e.join(auth, "p").groupBy($"c").agg(sum($"a").as("h"))
      auth = e.join(hub, "c").groupBy($"p").agg(sum($"h").as("a"))
    }
    auth.select($"p".as("partkey"), $"a".as("authority"))
      .orderBy($"authority".desc, $"partkey")
      .limit(HitsTop)
  }

  val q504Sql: String =
    s"""WITH e0 AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |deg AS (SELECT p, COUNT(*) AS d FROM e0 GROUP BY 1),
      |e AS MATERIALIZED (
      |  SELECT c, p FROM e0 JOIN deg USING (p)
      |  WHERE d <= ${ButterflyCount.BfDegCap}),
      |a1 AS MATERIALIZED (
      |  SELECT p, CAST(COUNT(*) AS BIGINT) AS a FROM e GROUP BY 1),
      |h1 AS MATERIALIZED (
      |  SELECT c, CAST(SUM(a) AS BIGINT) AS h
      |  FROM e JOIN a1 USING (p) GROUP BY 1),
      |a2 AS MATERIALIZED (
      |  SELECT p, CAST(SUM(h) AS BIGINT) AS a
      |  FROM e JOIN h1 USING (c) GROUP BY 1),
      |h2 AS MATERIALIZED (
      |  SELECT c, CAST(SUM(a) AS BIGINT) AS h
      |  FROM e JOIN a2 USING (p) GROUP BY 1),
      |a3 AS MATERIALIZED (
      |  SELECT p, CAST(SUM(h) AS BIGINT) AS a
      |  FROM e JOIN h2 USING (c) GROUP BY 1)
      |SELECT p AS partkey, a AS authority
      |FROM a3
      |ORDER BY authority DESC, partkey
      |LIMIT $HitsTop""".stripMargin

  val queries: Map[String, Q] = Map(
    "q504_hits" -> q504Hits)
  val oracleSql: Map[String, String] = Map(
    "q504_hits" -> q504Sql)
}
