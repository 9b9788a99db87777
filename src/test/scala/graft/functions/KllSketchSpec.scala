package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Contracts for the KLL-family quantile aggregate behind q220. */
class KllSketchSpec extends AnyFunSuite with SparkSpec {

  private def maxRankErr(data: Array[Double], st: KllState, nq: Int): Double = {
    val n = data.length
    val qs = st.quantiles(nq)
    (0 to nq).map { j =>
      val r = data.count(_ <= qs(j)).toDouble
      math.abs(r - n.toDouble * j / nq) / n
    }.max
  }

  /** Deterministic pseudo-random stream (LCG) — reproducible specs. */
  private def lcg(n: Int, seed: Long = 42L): Array[Double] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble
    }
  }

  test("exact below capacity") {
    val st = new KllState(256)
    val data = lcg(200)
    data.foreach(st.update)
    assert(st.n === 200L)
    // no compaction has happened: every decile is an exact order statistic
    assert(maxRankErr(data, st, 10) <= 1.0 / 200 + 1e-9)
  }

  test("rank error bound on random data") {
    val st = new KllState(200)
    val data = lcg(50000)
    data.foreach(st.update)
    assert(st.n === 50000L)
    val err = maxRankErr(data, st, 10)
    assert(err <= 0.03, s"rank error $err")
  }

  test("rank error bound on sorted (adversarial) input") {
    val st = new KllState(200)
    val data = Array.tabulate(50000)(_.toDouble)
    data.foreach(st.update)
    val err = maxRankErr(data, st, 10)
    assert(err <= 0.03, s"rank error $err on sorted input")
  }

  test("merge tree matches the bound and preserves weight exactly") {
    val data = lcg(60000, seed = 7L)
    val chunks = data.grouped(9000).toArray
    val states = chunks.map { c =>
      val st = new KllState(200); c.foreach(st.update); st
    }
    // unbalanced fold merge (worst-ish tree shape)
    val root = states.reduce { (a, b) => a.merge(b); a }
    assert(root.n === data.length.toLong)
    val err = maxRankErr(data, root, 10)
    assert(err <= 0.03, s"rank error $err after merges")
  }

  test("serialize round-trips") {
    val st = new KllState(64)
    lcg(5000, seed = 3L).foreach(st.update)
    val back = KllState.deserialize(st.serialized)
    assert(back.n === st.n)
    assert(back.quantiles(10).toSeq === st.quantiles(10).toSeq)
  }

  test("grouped SQL aggregate honors the bound per group") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val n = 20000
    val df = lcg(n, seed = 11L).zipWithIndex
      .map { case (v, i) => (i % 3, v) }.toSeq.toDF("g", "value")
      .repartition(8)
    val rows = df.groupBy($"g")
      .agg(expr("kll_quantiles(value, 128, 4)").as("qs"),
        count(lit(1)).as("cnt"))
      .collect()
    assert(rows.length === 3)
    val byGroup = lcg(n, seed = 11L).zipWithIndex
      .groupBy { case (_, i) => i % 3 }
    rows.foreach { row =>
      val g = row.getInt(0)
      val qs = row.getSeq[Double](1)
      val cnt = row.getLong(2)
      val data = byGroup(g).map(_._1)
      assert(cnt === data.length.toLong)
      assert(qs.length === 5)
      (0 to 4).foreach { j =>
        val r = data.count(_ <= qs(j)).toDouble
        assert(math.abs(r - data.length.toDouble * j / 4) <= 0.05 * data.length,
          s"group $g decile $j off")
      }
    }
  }

  test("all-null group evaluates to NULL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1, Option.empty[Double]), (1, None), (2, Some(5.0)))
      .toDF("g", "value")
    val rows = df.groupBy($"g")
      .agg(expr("kll_quantiles(value, 32, 2)").as("qs"))
      .orderBy($"g").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[Double](1) === Seq(5.0, 5.0, 5.0))
  }
}
