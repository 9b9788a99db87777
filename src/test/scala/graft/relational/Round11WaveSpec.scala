package graft.relational

import graft.SparkSpec

/** Fixture pins for the round-11 widening wave (q461-q464). */
class Round11WaveSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q461: the planted marker token tops the PMI ranking") {
    val rows = graft.llm.PmiFeatures.q461PmiFeatures(spark, dir).collect()
    assert(rows.length == graft.llm.PmiFeatures.TopK)
    assert(rows.head.getString(0) == "join",
      s"planted marker must rank first, got ${rows.head.getString(0)}")
    // clear separation: the marker's PMI dominates the runner-up
    assert(rows(0).getAs[Long]("pmi_micro") > rows(1).getAs[Long]("pmi_micro"))
  }

  test("q462: planted extreme isolates in the shallowest quartile") {
    val (n, plantScore, le, mn, mx): (Long, Long, Long, Long, Long) =
      graft.operators.IsolationTree.treeStats(spark, dir)
    info(s"n=$n plant=$plantScore organic<=plant: $le min=$mn max=$mx")
    assert(n > 0 && mn < mx)
    assert(4L * le <= n, "plant must isolate in the shallowest quartile")
  }

  test("q462: c(m) normalizer pins (iForest average path length)") {
    import graft.operators.IsolationTree.cPath
    assert(cPath(1) == 0.0 && cPath(2) == 1.0)
    // c(256) = 2(ln 255 + gamma) - 2*255/256 ~ 10.24
    assert(math.abs(cPath(256) - 10.2440) < 0.001)
  }

  test("q463: LTTB keeps endpoints and strictly increasing days") {
    val rows = TimeSeriesQueries.q463LttbDownsample(spark, dir)
      .orderBy($"out_idx").collect()
    assert(rows.length == TimeSeriesQueries.LttbOut)
    assert(rows.head.getAs[Long]("d") == 0L, "first point is day 0")
    val ds = rows.map(_.getAs[Long]("d"))
    assert(ds.sliding(2).forall(p => p(0) < p(1)),
      "selected days must be strictly increasing (one per bucket)")
  }

  test("q465: recursive CTE computes min-hop closure on a hand graph") {
    import spark.implicits._
    // chain 10->20->30 plus a shortcut 10->30 and a cycle 30->10:
    // min hops from 10 must read 0/1/1, bounded recursion terminates
    Seq((10L, 20L), (20L, 30L), (10L, 30L), (30L, 10L))
      .toDF("u", "v").createOrReplaceTempView("q465_hand_edges")
    val got = spark.sql(
      s"""WITH RECURSIVE reach(node, hop) AS (
         |  SELECT CAST(MIN(u) AS BIGINT) AS node, 0 AS hop
         |  FROM q465_hand_edges
         |  UNION ALL
         |  SELECT e.v AS node, r.hop + 1 AS hop
         |  FROM reach r JOIN q465_hand_edges e ON e.u = r.node
         |  WHERE r.hop < ${Sql4Surfaces.RecHops})
         |SELECT node, CAST(MIN(hop) AS BIGINT) AS min_hops
         |FROM reach GROUP BY node""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 0L, 20L -> 1L, 30L -> 1L), s"got $got")
  }

  test("q464: time-decay credit is conserved and equals the linear pool") {
    val lin = JourneyQueries.q225MultiTouch(spark, dir).collect()
      .map(_.getAs[Long]("total_credit")).sum
    val dec = JourneyQueries.q464TimeDecayAttribution(spark, dir).collect()
      .map(_.getAs[Long]("total_credit")).sum
    assert(dec > 0L)
    assert(dec % JourneyQueries.CreditPool == 0L,
      "every attributed purchase pays out exactly one pool")
    assert(dec == lin,
      "decay reallocates WITHIN purchases; the total pool is identical")
  }
}
