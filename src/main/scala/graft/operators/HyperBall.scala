package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.core.{Tables => T}

/** HYPERBALL neighborhood function (Boldi–Vigna WebSci'13; the
  * HyperANF successor — "how many nodes are within t hops", the input
  * to effective-diameter and centrality readouts): per node, an HLL
  * sketch of its t-ball grows by ONE union along in-edges per round —
  * O(t) keyed shuffles of n sketch rows, the ONLY way a
  * diameter-shaped question scales to graphs where exact t-hop
  * reachability (|pairs| → n²) is unthinkable. Sketch state is
  * Spark's DataSketches HLL (q122's `hll_sketch_agg` /
  * `hll_union_agg` machinery, lgk = [[HbLgk]]).
  *
  * Graph: the q483-style md5 two-out-edge graph over customer keys
  * (salts `k1:`/`k2:`), symmetrized, self-loop added so round t keeps
  * the (t−1)-ball (monotone by construction).
  *
  * Gate (in-engine, the q122 tolerance-boolean convention): for every
  * round t ≤ [[HbRounds]], the SUMMED ball-size estimate over a
  * [[HbSampleSrc]]-node hash sample must sit within
  * [[HbTolPermille]]‰ of the EXACT summed t-ball sizes, computed by a
  * per-source frontier expansion on the SAME sample (the exact side
  * is sample-bounded — 64·n pairs, never n²). Oracle pins
  * (n_nodes, n_rounds, ok).
  */
object HyperBall {

  type Q = (SparkSession, String) => DataFrame

  val HbRounds = 4
  val HbLgk = 12
  val HbSampleSrc = 64L
  val HbTolPermille = 80L

  /** Symmetrized two-out-edge md5 graph + self-loops: (src, dst). */
  def hbEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = T.customer(s, dir).select($"c_custkey".as("v"))
    val n = cust.count()
    def h(salt: String) = pmod(conv(substring(
      md5(concat(lit(salt), $"v".cast("string"))), 1, 4), 16, 10)
      .cast("long"), lit(n))
    val out = cust.select($"v", h("k1:").as("w"))
      .unionAll(cust.select($"v", h("k2:").as("w")))
      .filter($"v" =!= $"w")
    out.select($"v".as("src"), $"w".as("dst"))
      .unionAll(out.select($"w".as("src"), $"v".as("dst")))
      .unionAll(cust.select($"v".as("src"), $"v".as("dst")))
      .distinct()
  }

  /** (n_nodes, per-round (estimate, exact) sums over the source
    * sample) — public for the spec.
    */
  def hyperballStats(s: SparkSession, dir: String)
      : (Long, Seq[(Double, Long)]) = {
    import s.implicits._
    val edges = PlanBridge.checkpointResetStats(hbEdges(s, dir))
    val nodes = edges.select($"dst".as("node")).distinct()
    val n = nodes.count()
    val sample = nodes
      .filter(pmod(xxhash64(lit("hbs"), $"node"), lit(1000L)) <
        (lit(1000L) * HbSampleSrc / math.max(n, 1L)) + lit(1L))
      .localCheckpoint()
    // HyperBall state: per-node sketch of {node}
    var state = PlanBridge.checkpointResetStats(
      nodes.groupBy($"node").agg(hll_sketch_agg($"node", lit(HbLgk))
        .as("sk")))
    // exact side: per-sample-source frontier (src, node)
    var ball = PlanBridge.checkpointResetStats(
      sample.select($"node".as("src"), $"node"))
    val out = Seq.newBuilder[(Double, Long)]
    for (_ <- 1 to HbRounds) {
      state = PlanBridge.checkpointResetStats(
        edges.join(state.withColumnRenamed("node", "src"), "src")
          .groupBy($"dst".as("node"))
          .agg(hll_union_agg($"sk").as("sk")))
      ball = PlanBridge.checkpointResetStats(
        ball.join(edges.withColumnRenamed("src", "node"), "node")
          .select($"src", $"dst".as("node")).distinct())
      val est = state.join(sample, "node")
        .agg(sum(hll_sketch_estimate($"sk"))).as[Double].head()
      val exact = ball.count()
      out += ((est, exact))
    }
    (n, out.result())
  }

  /** HARMONIC CENTRALITY from the same counters (Boldi–Vigna's
    * headline application: `HC(v) = Σ_t (|B_t(v)| − |B_{t−1}(v)|)/t`
    * weights each node by the reciprocal of its distance — the
    * centrality that stays finite on disconnected graphs, unlike
    * closeness): the per-round sketch estimates ARE the |B_t| terms,
    * so centrality costs nothing beyond q495's propagation. Returns
    * per sampled node (hc_estimate, hc_exact) — exact side from the
    * same sample-bounded frontier expansion.
    */
  def harmonicStats(s: SparkSession, dir: String)
      : Seq[(Long, Double, Double)] = {
    import s.implicits._
    val edges = PlanBridge.checkpointResetStats(hbEdges(s, dir))
    val nodes = edges.select($"dst".as("node")).distinct()
    val n = nodes.count()
    val sample = nodes
      .filter(pmod(xxhash64(lit("hbs"), $"node"), lit(1000L)) <
        (lit(1000L) * HbSampleSrc / math.max(n, 1L)) + lit(1L))
      .localCheckpoint()
    var state = PlanBridge.checkpointResetStats(
      nodes.groupBy($"node").agg(hll_sketch_agg($"node", lit(HbLgk))
        .as("sk")))
    var ball = PlanBridge.checkpointResetStats(
      sample.select($"node".as("src"), $"node"))
    val hcEst = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    val hcExact = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    var prevEst = sample.select($"node").as[Long].collect()
      .map(_ -> 1.0).toMap
    var prevExact = prevEst.keysIterator.map(_ -> 1L).toMap
    for (t <- 1 to HbRounds) {
      state = PlanBridge.checkpointResetStats(
        edges.join(state.withColumnRenamed("node", "src"), "src")
          .groupBy($"dst".as("node"))
          .agg(hll_union_agg($"sk").as("sk")))
      ball = PlanBridge.checkpointResetStats(
        ball.join(edges.withColumnRenamed("src", "node"), "node")
          .select($"src", $"dst".as("node")).distinct())
      val est = state.join(sample, "node")
        .select($"node", hll_sketch_estimate($"sk").as("e"))
        .as[(Long, Double)].collect().toMap
      val exact = ball.groupBy($"src").agg(count(lit(1)).as("c"))
        .as[(Long, Long)].collect().toMap
      prevEst.keysIterator.foreach { v =>
        hcEst(v) += (est.getOrElse(v, prevEst(v)) - prevEst(v)) / t
        hcExact(v) +=
          (exact.getOrElse(v, prevExact(v)) - prevExact(v)).toDouble / t
      }
      prevEst = prevEst.keysIterator.map(v =>
        v -> est.getOrElse(v, prevEst(v))).toMap
      prevExact = prevExact.keysIterator.map(v =>
        v -> exact.getOrElse(v, prevExact(v))).toMap
    }
    prevEst.keysIterator.map(v => (v, hcEst(v), hcExact(v))).toSeq
      .sortBy(_._1)
  }

  val q499HarmonicCentrality: Q = (s, dir) => {
    import s.implicits._
    val stats = harmonicStats(s, dir)
    val ok = stats.nonEmpty && stats.forall { case (_, est, exact) =>
      exact == 0.0 || math.abs(est - exact) * 1000.0 <=
        HbTolPermille.toDouble * exact
    }
    val n = T.customer(s, dir).count()
    Seq((n, ok)).toDF("n_nodes", "ok")
  }

  val q499Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, TRUE AS ok
      |FROM customer""".stripMargin

  val q495HyperBall: Q = (s, dir) => {
    import s.implicits._
    val (n, rounds) = hyperballStats(s, dir)
    val ok = rounds.forall { case (est, exact) =>
      math.abs(est - exact.toDouble) * 1000.0 <=
        HbTolPermille.toDouble * exact.toDouble
    }
    Seq((n, HbRounds.toLong, ok)).toDF("n_nodes", "n_rounds", "ok")
  }

  val q495Sql: String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST($HbRounds AS BIGINT) AS n_rounds, TRUE AS ok
       |FROM customer""".stripMargin

  val queries: Map[String, Q] = Map(
    "q495_hyperball" -> q495HyperBall,
    "q499_harmonic_centrality" -> q499HarmonicCentrality)
  val oracleSql: Map[String, String] = Map(
    "q495_hyperball" -> q495Sql,
    "q499_harmonic_centrality" -> q499Sql)
}
