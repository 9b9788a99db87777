package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** HODGES–LEHMANN SHIFT ESTIMATOR (Hodges–Lehmann AMS'63 — THE robust
  * two-sample location difference: the median of all n1·n2 pairwise
  * differences xᵢ − yⱼ, the estimator the Mann–Whitney test q285
  * inverts; completes the robust-location family next to q356's
  * trimmed mean and q90/q307's medians with the TWO-sample member):
  * Δ̂ between urgent and low-priority order totals.
  *
  * Scale architecture (the whole point of this operator): the pair set
  * is NEVER materialized — n1·n2 is 9·10⁸ already at sf0.1 and 10¹³ at
  * 100 TB. Selection runs as a BINARY SEARCH ON THE VALUE DOMAIN
  * (q307's selection discipline lifted to the implicit pair set):
  * count(d ≤ t) = Σₓ cₓ·(n2 − #{y < x − t}) folds over the two VALUE
  * CENSUSES via one merged cumulative scan per probe (union the Y
  * census with X probe rows at x−t−1, fullCumSum over the value order,
  * read the Y-count prefix at each probe — two-level scan, no
  * single-task window), so each of the O(log range) rounds costs one
  * census-sized pass and the driver holds ONE count per round (the
  * q477 bounded-collect rule). Doubled-median convention: hl2 =
  * d₍(P+1)÷2₎ + d₍(P+2)÷2₎ (the q527/q90 order-statistic pairing), so
  * ties and even counts are exact — no float quantile anywhere.
  *
  * Oracle: DuckDB BRUTE-FORCES the pair set (9·10⁶ pairs at sf0.01 —
  * fine single-node, impossible at scale) and reads the same two order
  * statistics off ROW_NUMBER — engine selection vs oracle enumeration
  * IS the gate.
  */
object HodgesLehmann {

  type Q = (SparkSession, String) => DataFrame

  val HlGroup1 = "1-URGENT"
  val HlGroup2 = "5-LOW"

  /** Δ̂ from the doubled pieces — shared verbatim. */
  val HlFormula: String = "CAST(hl2 AS DOUBLE) / 2.0"

  val q537HodgesLehmann: Q = (s, dir) => {
    import s.implicits._
    val rows = T.orders(s, dir)
      .filter($"o_orderpriority".isin(HlGroup1, HlGroup2))
      .select(when($"o_orderpriority" === HlGroup1, 1L).otherwise(2L)
        .as("g"),
        expr("CAST(FLOOR(100 * o_totalprice) AS BIGINT)").as("v"))
    hlShift(rows)
  }

  /** HL shift Δ̂ (doubled) of group 1 minus group 2 over a
    * `(g ∈ {1,2}, v)` frame.
    */
  def hlShift(rowsIn: DataFrame): DataFrame = {
    val s = rowsIn.sparkSession
    import s.implicits._
    val rows = rowsIn.localCheckpoint()
    val cx = rows.filter($"g" === 1L).groupBy($"v")
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val cyRaw = rows.filter($"g" === 2L).groupBy($"v")
      .agg(count(lit(1)).as("c"))
    // Y census with inclusive cumulative counts (two-level scan)
    val cy = QuantileNormalize.fullCumSum(cyRaw, Seq(col("v")), "c", "cum")
      .localCheckpoint()
    val (n1, minX, maxX) = cx
      .agg(sum($"c"), min($"v"), max($"v")).as[(Long, Long, Long)].head()
    val (n2, minY, maxY) = cy
      .agg(sum($"c"), min($"v"), max($"v")).as[(Long, Long, Long)].head()
    val pairs = n1 * n2
    require(pairs > 0L, "both groups must be non-empty")

    /** #{(x,y) : x − y ≤ t} via one merged cumulative scan. */
    def countLE(t: Long): Long = {
      // probe rows at value x − t − 1 pick up cumY(< x − t); Y rows
      // sort first at equal value (flag 0) so an exactly-landing
      // probe still reads the inclusive Y prefix
      val probes = cx.select(($"v" - t - 1L).as("pv"), lit(1L).as("flag"),
        lit(0L).as("yc"), $"c".as("xc"))
      val ys = cy.select($"v".as("pv"), lit(0L).as("flag"),
        $"c".as("yc"), lit(0L).as("xc"))
      val merged = JonckheereTerpstra.multiCumSum(
        ys.unionAll(probes), Seq(col("pv"), col("flag")), Seq("yc"))
      merged.filter($"flag" === 1L)
        .agg(sum($"xc" * (lit(n2) - $"cum_yc")).cast("long"))
        .as[Long].head()
    }

    /** Smallest t with countLE(t) ≥ k (binary search on the domain). */
    def select(k: Long, lo0: Long, hi0: Long): Long = {
      var lo = lo0; var hi = hi0
      while (lo < hi) {
        val mid = Math.floorDiv(lo + hi, 2)
        if (countLE(mid) >= k) hi = mid else lo = mid + 1
      }
      lo
    }

    val (lo0, hi0) = (minX - maxY, maxX - minY)
    val kLo = (pairs + 1) / 2
    val kHi = (pairs + 2) / 2
    val dLo = select(kLo, lo0, hi0)
    val dHi = if (kHi == kLo) dLo else select(kHi, dLo, hi0)
    Seq((n1, n2, pairs, dLo + dHi)).toDF("n1", "n2", "p_pairs", "hl2")
      .withColumn("hl_shift", expr(HlFormula))
  }

  val q537Sql: String =
    s"""WITH rows_ AS MATERIALIZED (
      |  SELECT CASE WHEN o_orderpriority = '$HlGroup1' THEN 1 ELSE 2 END
      |    AS g,
      |    CAST(FLOOR(100 * o_totalprice) AS BIGINT) AS v
      |  FROM orders
      |  WHERE o_orderpriority IN ('$HlGroup1', '$HlGroup2')),
      |diffs AS (
      |  SELECT x.v - y.v AS d
      |  FROM (SELECT v FROM rows_ WHERE g = 1) x,
      |       (SELECT v FROM rows_ WHERE g = 2) y),
      |ranked AS (
      |  SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS r,
      |    COUNT(*) OVER () AS p FROM diffs),
      |m AS (
      |  SELECT
      |    (SELECT COUNT(*) FROM rows_ WHERE g = 1) AS n1,
      |    (SELECT COUNT(*) FROM rows_ WHERE g = 2) AS n2,
      |    (SELECT CAST(MAX(p) AS BIGINT) FROM ranked) AS p_pairs,
      |    (SELECT CAST(SUM(d *
      |       ((CASE WHEN r = (p + 1) // 2 THEN 1 ELSE 0 END)
      |        + (CASE WHEN r = (p + 2) // 2 THEN 1 ELSE 0 END)))
      |       AS BIGINT) FROM ranked) AS hl2)
      |SELECT n1, n2, p_pairs, hl2, $HlFormula AS hl_shift
      |FROM m""".stripMargin

  val queries: Map[String, Q] = Map(
    "q537_hodges_lehmann" -> q537HodgesLehmann)
  val oracleSql: Map[String, String] = Map(
    "q537_hodges_lehmann" -> q537Sql)
}
