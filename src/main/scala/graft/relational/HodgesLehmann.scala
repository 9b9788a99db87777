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
  * 100 TB. Selection runs as a 127-WAY DOMAIN DESCENT (q307's
  * selection discipline lifted to the implicit pair set): each pass
  * computes the exact count(d ≤ t) = Σₓ cₓ·(n2 − #{y < x − t}) at 127
  * thresholds simultaneously over the two VALUE CENSUSES —
  * ⌈log₁₂₈(range)⌉ ≈ 4 passes total — and the driver holds only the
  * per-pass counts (the q477 bounded-collect rule). A pass is
  * MAP-ONLY while the Y census fits the broadcast budget (binary
  * search against the broadcast cumulative — at most value-DOMAIN
  * rows regardless of corpus size), with the distributed merged
  * cumulative scan as the spec-pinned over-budget fallback.
  * Doubled-median convention: hl2 = d₍(P+1)÷2₎ + d₍(P+2)÷2₎ (the
  * q527/q90 order-statistic pairing), so ties and even counts are
  * exact — no float quantile anywhere.
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

  /** Broadcast budget for the Y-census fast path, in rows. The census
    * ships as two primitive `Array[Long]`s (values, inclusive cums), so
    * the steady footprint is a TRUE 16 B/row — 64 MB per executor at
    * this cap; the driver additionally pays a TRANSIENT boxed collect
    * (~56-64 B/row, ~250 MB at the cap) while building the arrays,
    * which is the number to budget driver heap against. Larger
    * censuses take the distributed merged-scan path.
    */
  val HlBroadcastMaxCensus = 4000000L

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
    * `(g ∈ {1,2}, v)` frame. `forceDistributed` pins the merged-scan
    * path (the spec exercises both).
    */
  def hlShift(rowsIn: DataFrame, forceDistributed: Boolean = false)
      : DataFrame = {
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

    /** #{(x,y) : x − y ≤ t} for EVERY threshold in `ts`, in ONE merged
      * cumulative pass: probe rows at value x − t − 1 pick up
      * cumY(< x − t) (Y rows sort first at equal value, flag 0, so an
      * exactly-landing probe reads the inclusive Y prefix); probes
      * contribute 0 to the running yc, so all thresholds share the
      * scan. Partitioning is by FIXED value-domain buckets (pid =
      * 32-way split of the merged pv range) — deterministic, so the
      * cross-partition offsets need NO second read of the frame (no
      * checkpoint, no repartitionByRange sampling job): one shuffle,
      * one per-pid window, one partial agg; the 32·|ts| per-(pid, t)
      * partials combine on the driver with the per-pid Y totals'
      * prefix (the q477 bounded-collect rule; value-skewed domains
      * make buckets uneven but never wrong).
      */
    def countLEMany(ts: Seq[Long]): Map[Long, Long] = {
      val tDf = ts.toDF("t")
      val probes = cx.crossJoin(broadcast(tDf))
        .select(($"v" - $"t" - 1L).as("pv"), lit(1L).as("flag"),
          lit(0L).as("yc"), $"c".as("xc"), $"t")
      val ys = cy.select($"v".as("pv"), lit(0L).as("flag"),
        $"c".as("yc"), lit(0L).as("xc"), lit(Long.MinValue).as("t"))
      val lo = math.min(minY, minX - ts.max - 1)
      val hi = math.max(maxY, maxX - ts.min - 1)
      val span = hi - lo + 1
      val parts = ys.unionAll(probes)
        .withColumn("pid",
          expr(s"CAST((pv - ${lo}L) * 32 div ${span}L AS INT)"))
        .repartition(32, col("pid"))
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy($"pid").orderBy($"pv", $"flag", $"t")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val partials = parts.withColumn("pcum", sum($"yc").over(wIn))
        .groupBy($"pid", $"t")
        .agg(sum($"yc").as("ysum"),
          sum($"xc" * (lit(n2) - $"pcum")).as("s1"),
          sum($"xc").as("s2"))
        .collect().map(r => (r.getInt(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4)))
      val ytot = partials.groupBy(_._1).view
        .mapValues(_.map(_._3).sum).toMap
      val pids = ytot.keys.toSeq.sorted
      val poff = pids.zip(pids.scanLeft(0L)((acc, p) =>
        acc + ytot(p)).dropRight(1)).toMap
      ts.map { t =>
        t -> partials.filter(p => p._2 == t)
          .map(p => p._4 - poff(p._1) * p._5).sum
      }.toMap
    }

    /** Fan-out of the domain descent: 127 thresholds per pass ⟹
      * ⌈log₁₂₈(range)⌉ ≈ 4-5 census passes for the whole selection
      * instead of ~62 bisection rounds (26.6 s → single digits at
      * sf0.1).
      */
    val Fan = 127

    /** Smallest t with count(≤ t) ≥ k and its count — multi-boundary
      * domain descent; invariant: count(lo) < k ≤ count(hi).
      */
    def select(k: Long, loIn: Long, hiIn: Long,
        counts: Seq[Long] => Map[Long, Long]): (Long, Long) = {
      var lo = loIn - 1
      var hi = hiIn
      var hiCnt = -1L
      while (hi - lo > 1) {
        val width = hi - lo
        val ts =
          if (width <= Fan + 1) ((lo + 1) until hi).toSeq
          else (1 to Fan).map(j => lo + width / (Fan + 1) * j).distinct
        val tPass = System.nanoTime()
        val cnts = counts(ts)
        if (sys.env.contains("GRAFT_HL_PROF"))
          println(s"[hl] pass width=$width ts=${ts.size} " +
            f"${(System.nanoTime() - tPass) / 1e9}%.2fs")
        val above = ts.filter(t => cnts(t) >= k)
        val below = ts.filter(t => cnts(t) < k)
        if (above.nonEmpty) { hi = above.min; hiCnt = cnts(hi) }
        if (below.nonEmpty) lo = below.max
      }
      (hi, if (hiCnt >= 0) hiCnt else counts(Seq(hi))(hi))
    }

    /** Smallest pairwise diff STRICTLY greater than `t0`: per probe
      * x the largest y < x − t0 (a running MAX over the merged value
      * order — the same two-level shape as the cumulative), minimized
      * over probes. ONE pass — replaces a second full descent when
      * the kHi order statistic sits past dLo's tie run.
      */
    def nextDiffAfter(t0: Long): Long = {
      val probes = cx.select(($"v" - t0 - 1L).as("pv"),
        lit(1L).as("flag"), lit(Long.MinValue).as("ym"), $"v".as("x"))
      val ys = cy.select($"v".as("pv"), lit(0L).as("flag"),
        $"v".as("ym"), lit(Long.MinValue).as("x"))
      val parts = org.apache.spark.sql.graftbridge.PlanBridge
        .checkpointResetStats(ys.unionAll(probes)
          .repartitionByRange(32, col("pv"), col("flag"))
          .withColumn("pid", spark_partition_id()))
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy($"pid").orderBy($"pv", $"flag")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val withMax = parts.withColumn("pmax", max($"ym").over(wIn))
      // bounded triangular join, not a pid-ordered window (r18,
      // verdict item 5): exclusive prefix-MAX over ≤32 pid rows
      val pmaxs = withMax.groupBy($"pid").agg(max($"ym").as("pm"))
      val offsets = pmaxs.as("a").join(pmaxs.as("b"),
          col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid"))
        .agg(coalesce(max(col("b.pm")), lit(Long.MinValue)).as("poff"))
        .select(col("pid"), col("poff"))
      withMax.join(broadcast(offsets), "pid")
        .filter($"flag" === 1L)
        .select(greatest($"pmax", $"poff").as("ybest"), $"x")
        .filter($"ybest" > Long.MinValue)
        .agg(min($"x" - $"ybest").cast("long"))
        .as[Long].head()
    }

    // Broadcast fast path: the Y census with inclusive cum is
    // NDV(Y)-bounded — for a cents-valued column that is at most the
    // VALUE DOMAIN regardless of corpus size, and it fits an executor
    // broadcast far past these fixtures ([[HodgesLehmann.HlBroadcastMaxCensus]]);
    // every count pass then runs MAP-ONLY (local binary search per
    // probe, one 127-cell partial per partition — no shuffle at all).
    // Past the budget the merged-scan path above takes over unchanged.
    val cyCount = cy.count()
    val useBroadcast = !forceDistributed &&
      cyCount <= HodgesLehmann.HlBroadcastMaxCensus
    // Broadcast TWO PRIMITIVE Long arrays, not Array[(Long, Long)]:
    // boxed Tuple2[Long, Long] rows cost ~56-64 B each on the JVM heap
    // (r14 advice note — the documented per-row budget was 4× under),
    // flat long[]s cost the true 16 B/row, and the binary search reads
    // them with zero unboxing. The tuple form exists only transiently
    // inside collect() on the driver.
    val cyBc: org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Long])] =
      if (useBroadcast) {
        val rows = cy.orderBy($"v").select($"v", $"cum")
          .as[(Long, Long)].collect()
        s.sparkContext.broadcast((rows.map(_._1), rows.map(_._2)))
      } else null

    def countLEManyBc(ts: Seq[Long]): Map[Long, Long] = {
      val tsArr = ts.toArray
      val nn2 = n2
      val partials = cx.select($"v", $"c").as[(Long, Long)]
        .mapPartitions { it =>
          val (vs, cums) = cyBc.value
          val acc = new Array[Long](tsArr.length)
          it.foreach { case (x, xc) =>
            var i = 0
            while (i < tsArr.length) {
              val p = x - tsArr(i) - 1
              // rightmost y <= p
              var lo = 0; var hi = vs.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (vs(mid) <= p) lo = mid + 1 else hi = mid
              }
              val cum = if (lo == 0) 0L else cums(lo - 1)
              acc(i) += xc * (nn2 - cum)
              i += 1
            }
          }
          acc.iterator.zipWithIndex.map { case (v, i) => (i, v) }
        }
      partials.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect().map { case (i, v) => tsArr(i) -> v }.toMap
    }

    def countMany(ts: Seq[Long]): Map[Long, Long] =
      if (useBroadcast) countLEManyBc(ts) else countLEMany(ts)

    /** Smallest pairwise diff strictly greater than t0 — broadcast
      * form (one map-only pass); [[nextDiffAfter]] is the distributed
      * fallback.
      */
    def nextDiffAfterBc(t0: Long): Long = {
      cx.select($"v").as[Long].mapPartitions { it =>
        val (vs, _) = cyBc.value
        var best = Long.MaxValue
        it.foreach { x =>
          val p = x - t0 - 1
          var lo = 0; var hi = vs.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (vs(mid) <= p) lo = mid + 1 else hi = mid
          }
          if (lo > 0) {
            val d = x - vs(lo - 1)
            if (d < best) best = d
          }
        }
        Iterator.single(best)
      }.reduce((a, b) => math.min(a, b))
    }

    val (lo0, hi0) = (minX - maxY, maxX - minY)
    val kLo = (pairs + 1) / 2
    val kHi = (pairs + 2) / 2
    val (dLo, dLoCnt) = select(kLo, lo0, hi0, countMany)
    val dHi =
      if (kHi == kLo || dLoCnt >= kHi) dLo
      else if (useBroadcast) nextDiffAfterBc(dLo)
      else nextDiffAfter(dLo)
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
