package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 wave: the ExactDiv de-float discipline (q540/q354/q575/
  * q576), MaxSim late interaction (q578), equality deletes (q579).
  */
class Round17WaveSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------
  // ExactDiv — the shared integer-division finish
  // ---------------------------------------------------------------

  test("ExactDiv: microFloor matches hand pins on both signs and " +
      "both engines' division semantics (Spark div truncates like " +
      "DuckDB //)") {
    import spark.implicits._
    // floor(1e6·7/3) = 2333333, floor(1e6·(-7)/3) = -2333334 (true
    // floor, NOT the -2333333 truncation); exact divide stays exact
    val rows = Seq((7L, 3L), (-7L, 3L), (6L, 3L), (-6L, 3L))
      .toDF("numL", "denL")
      .select(expr("CAST(numL AS DECIMAL(38,0))").as("num"),
        expr("CAST(denL AS DECIMAL(38,0))").as("den"))
    val out = rows.select(
      expr("CAST(" +
        graft.core.ExactDiv.microFloor("num", "den", "div") +
        " AS BIGINT)").as("m"),
      expr("CAST(" +
        graft.core.ExactDiv.floorDiv("num", "den", "div") +
        " AS BIGINT)").as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((2333333L, 2L), (-2333334L, -3L),
      (2000000L, 2L), (-2000000L, -2L)), s"got $out")
  }

  test("ExactDiv: the digit-group identity survives 128-bit " +
      "operands a naive 1e6 multiply would overflow") {
    // num = 1.6e35, den = 4e34: 1e6·num = 1.6e41 > DECIMAL(38,0) max,
    // but the quotient is exactly 4e6 micro-units
    val wide = spark.sql(
      "SELECT CAST('160000000000000000000000000000000000' AS " +
        "DECIMAL(38,0)) AS num, " +
        "CAST('40000000000000000000000000000000000' AS " +
        "DECIMAL(38,0)) AS den")
    val m = wide.select(expr("CAST(" +
      graft.core.ExactDiv.microFloor("num", "den", "div") +
      " AS BIGINT)").as("m")).head().getLong(0)
    assert(m == 4000000L, s"wide-operand micro division gave $m")
  }

  // ---------------------------------------------------------------
  // q578 MaxSim
  // ---------------------------------------------------------------

  test("q578: hand 2-doc MaxSim — per-query-token argmax over doc " +
      "tokens, exact Q20 integer sums") {
    import spark.implicits._
    // doc 0 (vec_id 0-7): eight (1, 0) tokens; doc 1 (vec_id 8-15):
    // four (0.5, 0) + four (0, 1). Q20: 1 -> 1048576, 0.5 -> 524288.
    // maxsim(0 -> 1) = 8 · max(1048576·524288, 0) = 4398046511104
    // maxsim(1 -> 0) = 4·(524288·1048576) + 4·0   = 2199023255552
    val vecs = (0L until 16L).map { i =>
      val v: Array[Float] =
        if (i < 8L) Array(1.0f, 0.0f)
        else if (i < 12L) Array(0.5f, 0.0f)
        else Array(0.0f, 1.0f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val out = graft.llm.MaxSim.maxSim(vecs, graft.llm.MaxSim.MsTokK)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("did"), r.getAs[Long]("maxsim"))).toSeq
    assert(out == Seq((0L, 1, 1L, 4398046511104L),
      (1L, 1, 0L, 2199023255552L)), s"got $out")
  }

  test("q578: candidate-leg rerank is rank-parity with exact full " +
      "MaxSim scoring on the corpus (the late-interaction recall " +
      "measurement)") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, dir)
    val pruned = graft.llm.MaxSim.maxSim(emb, graft.llm.MaxSim.MsTokK)
      .select("qid", "rank", "did", "maxsim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val exact = graft.llm.MaxSim.maxSim(emb, Int.MaxValue)
      .select("qid", "rank", "did", "maxsim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val hit = (pruned intersect exact).size
    info(s"rank parity: $hit/${exact.size} (pruned=${pruned.size})")
    assert(exact.nonEmpty)
    // measured: the per-token K=16 candidate leg reproduces the exact
    // top-5 lists verbatim at sf0.001 AND sf0.01 (the centroid-sum
    // surrogate it replaced reached only 15/60); a regression in
    // either leg (token top-K, argmax ties, rank order) breaks this
    assert(pruned == exact,
      s"candidate leg lost rank parity: ${exact.size - hit} rows differ")
  }

  // ---------------------------------------------------------------
  // q579 equality deletes
  // ---------------------------------------------------------------

  test("q579: both delete kinds coexist in one scan — non-empty " +
      "overlap, and the merged view equals the logical complement") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, dir)
    val eqUsers = ev.filter($"event_type" === "error" &&
        $"user_id" % graft.sources.EqualityDeletes.EqKeyMod ===
          graft.sources.EqualityDeletes.EqKeyRem)
      .select($"user_id").distinct()
    // composition is actually exercised: some row is hit by BOTH the
    // position predicate and the equality key set
    val overlap = ev.join(eqUsers, Seq("user_id"), "left_semi")
      .filter($"event_id" % graft.sources.DeletionVectors.DeleteMod ===
        graft.sources.DeletionVectors.DeleteRem)
      .count()
    info(s"rows deleted by BOTH kinds: $overlap")
    assert(overlap > 0L, "fixture no longer exercises the overlap")
    // engine view vs the Spark-side logical complement (the DuckDB
    // oracle replays the same complement independently)
    val got = graft.sources.EqualityDeletes
      .q579EqualityDeletes(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = ev
      .filter($"event_id" % graft.sources.DeletionVectors.DeleteMod =!=
        graft.sources.DeletionVectors.DeleteRem)
      .join(eqUsers, Seq("user_id"), "left_anti")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got $got want $want")
  }
}
