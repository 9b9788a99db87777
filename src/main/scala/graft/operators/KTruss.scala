package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.core.{Tables => T}

/** K-TRUSS DECOMPOSITION (Cohen NSA-TR'08; Wang–Cheng VLDB'12) — the
  * triangle-density subgraph family member between q294's k-core
  * (degree ≥ k) and clique mining: the k-truss keeps every edge
  * supported by ≥ k−2 triangles WITHIN the surviving subgraph, peeled
  * to fixpoint. Cohesion by TRIANGLES, not degree — a hub with many
  * leaf neighbors survives a core and dies in a truss.
  *
  * Graph: md5 out-edges confined to 32-node BLOCKS ([[KtOutEdges]]
  * salts per node, symmetrized, no self-loops) — block locality gives
  * the triangle density a truss needs (a uniform random graph of this
  * degree has a constant expected triangle count and an EMPTY 4-truss
  * at any n; measured here: 10368 → 1136 edges at sf0.01, fixpoint in
  * 5 peels).
  *
  * Scale shape: each peel round is the triangle-SUPPORT census — two
  * keyed equi-joins of the current edge list with itself + one partial
  * agg (fan-out bounded by block degree) — then a HAVING filter;
  * rounds are checkpointed (checkpointResetStats — the iterative-loop
  * rule) and the shrinking is monotone, so count-equality IS
  * set-equality and the fixpoint test costs one count per round.
  * Peel count grows slowly with n (4/5/7 at sf0.001/0.01/0.1).
  *
  * Oracle: [[KtUnrolledRounds]] peel rounds UNROLLED as MATERIALIZED
  * CTEs (the q474/q483 replay discipline) — at the oracle's SFs the
  * fixpoint lands within the unroll (monotone ⟹ extra rounds are
  * no-ops), so the FULL surviving edge set is value-checked.
  */
object KTruss {

  type Q = (SparkSession, String) => DataFrame

  val TrussK = 4
  val KtBlock = 32
  val KtOutEdges = 4
  /** ≥ fixpoint+1 at every oracle SF (measured 4/5 at sf0.001/0.01). */
  val KtUnrolledRounds = 6
  /** Runaway guard for the in-engine loop. */
  val KtMaxRounds = 24

  /** Symmetrized block-local md5 graph, both directions, no loops. */
  def ktEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = T.customer(s, dir).select($"c_custkey".as("v"))
      .select($"v", explode(array((1 to KtOutEdges).map(lit): _*)).as("k"))
      .withColumn("w",
        expr(s"(v div $KtBlock) * $KtBlock + " +
          s"CAST(conv(substring(md5(concat('kt', CAST(k AS STRING), ':', " +
          s"CAST(v AS STRING))), 1, 4), 16, 10) AS BIGINT) % $KtBlock"))
      .filter($"v" =!= $"w")
      .select($"v", $"w")
    out.select($"v".as("u"), $"w".as("v"))
      .unionAll(out.select($"w".as("u"), $"v".as("v")))
      .distinct()
  }

  /** Triangle support per directed edge within `e`. */
  private def support(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val a = e.select($"u".as("au"), $"v".as("aw"))
    val b = e.select($"u".as("bu"), $"v".as("bw"))
    e.join(a, $"au" === $"u" && $"aw" =!= $"v")
      .join(b, $"bu" === $"v" && $"bw" === $"aw")
      .groupBy($"u", $"v").agg(count(lit(1)).as("sup"))
  }

  val q509KTruss: Q = (s, dir) => {
    import s.implicits._
    var e = PlanBridge.checkpointResetStats(ktEdges(s, dir))
    var prev = e.count()
    var rounds = 0
    var stable = false
    while (!stable) {
      rounds += 1
      require(rounds <= KtMaxRounds, s"peel did not stabilize in $rounds")
      e = PlanBridge.checkpointResetStats(
        support(e).filter($"sup" >= TrussK - 2).select($"u", $"v"))
      val n = e.count()
      stable = n == prev
      prev = n
    }
    e.filter($"u" < $"v").orderBy($"u", $"v")
  }

  val q509Sql: String = {
    val base =
      s"""WITH outs AS (
        |  SELECT c_custkey AS v,
        |    (c_custkey // $KtBlock) * $KtBlock +
        |    CAST('0x' || substring(md5('kt' || k || ':' || c_custkey), 1, 4)
        |      AS BIGINT) % $KtBlock AS w
        |  FROM customer, (SELECT UNNEST(range(1, ${KtOutEdges + 1})) AS k)),
        |f AS (SELECT v, w FROM outs WHERE v <> w),
        |e0 AS MATERIALIZED (
        |  SELECT DISTINCT u, v FROM (
        |    SELECT v AS u, w AS v FROM f
        |    UNION ALL SELECT w AS u, v AS v FROM f))""".stripMargin
    val rounds = (1 to KtUnrolledRounds).map { r =>
      s"""e$r AS MATERIALIZED (
        |  SELECT e.u, e.v FROM e${r - 1} e
        |  JOIN e${r - 1} a ON a.u = e.u AND a.v <> e.v
        |  JOIN e${r - 1} b ON b.u = e.v AND b.v = a.v
        |  GROUP BY e.u, e.v HAVING COUNT(*) >= ${TrussK - 2})""".stripMargin
    }.mkString(",\n")
    s"""$base,
      |$rounds
      |SELECT u, v FROM e$KtUnrolledRounds WHERE u < v ORDER BY u, v"""
      .stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q509_ktruss" -> q509KTruss)
  val oracleSql: Map[String, String] = Map(
    "q509_ktruss" -> q509Sql)
}
