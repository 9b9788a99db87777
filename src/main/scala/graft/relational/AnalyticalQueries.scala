package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Tables => T, dsl, OracleDsl => O}

/** Multi-join analytical headliners (TPC-H Q3/Q5 shapes) — the
  * join-ordering / broadcast-chain stress tests of the relational
  * surface. Both are declarative: Catalyst reorders the joins, AQE
  * picks broadcast vs SMJ per edge at runtime.
  *
  * Scale shapes:
  *   - q82 (Q3): the segment filter shrinks customer ~5×, but customer
  *     still scales with SF (150k rows/SF), so no hard broadcast hint —
  *     AQE broadcasts it while it fits and demotes to shuffle at scale;
  *     top-k via TakeOrderedAndProject.
  *   - q83 (Q5): only the fixed-cardinality dims (nation=25, region=5)
  *     carry hard hints. supplier (10k/SF) and customer (150k/SF) scale
  *     with the data, so their edges are left to AQE: shuffle SMJ at
  *     100 TB, broadcast while genuinely small. The same-nation
  *     predicate (local supplier) lands as a join filter, never a
  *     post-join cross check.
  */
object AnalyticalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Q3 shape — shipping-priority revenue: segment-filtered customers'
    * orders before a cutoff, lines shipped after it, top-10 orders by
    * revenue.
    */
  val q82ShippingPriority: Q = (s, dir) => {
    import s.implicits._
    val cutoff = lit("1997-06-30").cast(TimestampType)
    val cust = T.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ords = T.orders(s, dir).filter($"o_orderdate" < cutoff)
    val lines = T.lineitem(s, dir).filter($"l_shipdate" > cutoff)
    lines
      .join(ords, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsl.dsumExpr($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  val q82Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${O.dsumExpr("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey ASC
       |LIMIT 10""".stripMargin

  /** Q5 shape — local-supplier revenue by nation: five-way join where
    * customer and supplier must sit in the SAME nation, rolled up per
    * nation within one region.
    */
  val q83LocalSupplierVolume: Q = (s, dir) => {
    import s.implicits._
    val nations = T.nation(s, dir)
      .join(broadcast(T.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    T.lineitem(s, dir)
      .join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(T.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .join(T.customer(s, dir),
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nations), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsl.dsumExpr($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"revenue".desc, $"n_name".asc)
  }

  val q83Sql: String =
    s"""SELECT n_name,
       |  ${O.dsumExpr("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** q94 — sequential conversion funnel over the events stream:
    * furthest stage reached per user along signup → first view within
    * [[FunnelHorizon]] of signup → first purchase within the horizon of
    * that view, rolled up to users per stage. The staged-min spelling
    * (three keyed aggregates chained by joins) is portable SQL; every
    * join key is user_id, so at scale the three aggregations share one
    * hash-partitioning and the per-stage frames are tiny (one row per
    * qualifying user).
    */
  val FunnelHorizon = "1 hour"

  val q94Funnel: Q = (s, dir) => {
    import s.implicits._
    val ev = T.events(s, dir).select($"user_id", $"event_type", $"ts")
    val ts0 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("t_s"))
    val tv = ev.filter($"event_type" === "view")
      .join(ts0, "user_id")
      .filter($"ts" >= $"t_s" && $"ts" <= $"t_s" + expr(s"interval $FunnelHorizon"))
      .groupBy($"user_id").agg(min($"ts").as("t_v"))
    val tp = ev.filter($"event_type" === "purchase")
      .join(tv, "user_id")
      .filter($"ts" >= $"t_v" && $"ts" <= $"t_v" + expr(s"interval $FunnelHorizon"))
      .groupBy($"user_id").agg(min($"ts").as("t_p"))
    ts0.join(tv, Seq("user_id"), "left").join(tp, Seq("user_id"), "left")
      .withColumn("stage",
        when($"t_p".isNotNull, 3).when($"t_v".isNotNull, 2).otherwise(1))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
      .orderBy($"stage")
  }

  val q94Sql: String =
    """WITH s AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_s
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |v AS (
      |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_v
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) >= s.t_s
      |    AND CAST(e.ts AS TIMESTAMP) <= s.t_s + INTERVAL '1 hour'
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_p
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= v.t_v
      |    AND CAST(e.ts AS TIMESTAMP) <= v.t_v + INTERVAL '1 hour'
      |  GROUP BY e.user_id)
      |SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
      |            WHEN v.user_id IS NOT NULL THEN 2 ELSE 1 END AS stage,
      |  COUNT(*) AS n_users
      |FROM s LEFT JOIN v ON s.user_id = v.user_id
      |       LEFT JOIN p ON s.user_id = p.user_id
      |GROUP BY 1
      |ORDER BY stage""".stripMargin

  /** q119 — cohort retention matrix, the second event-analytics shape
    * next to the funnel: users grouped by signup week (cohort), counted
    * in each subsequent activity week. Weeks are Monday-truncated in
    * both engines; `week_n` divides a day difference of week-truncated
    * dates, so it is exact integer arithmetic throughout.
    *
    * Scale shape: activity pre-aggregates to DISTINCT (user, week)
    * BEFORE the cohort join — the join input shrinks from events to
    * user-weeks, and afterwards rows are unique per (user, week_n), so
    * the matrix cell is a plain `count`, no count-distinct shuffle. Both
    * the cohort build and the join hash-partition on user_id — one
    * shared exchange at cluster scale.
    */
  val q119CohortRetention: Q = (s, dir) => {
    import s.implicits._
    val ev = T.events(s, dir).select($"user_id", $"event_type", $"ts")
    val cohort = ev.filter($"event_type" === "signup")
      .groupBy($"user_id")
      .agg(to_date(date_trunc("week", min($"ts"))).as("cohort_week"))
    val act = ev
      .select($"user_id", to_date(date_trunc("week", $"ts")).as("act_week"))
      .distinct()
    cohort.join(act, "user_id")
      .filter($"act_week" >= $"cohort_week")
      .withColumn("week_n",
        expr("datediff(act_week, cohort_week) div 7").cast("long"))
      .groupBy($"cohort_week", $"week_n")
      .agg(count(lit(1)).as("n_active"))
      .orderBy($"cohort_week", $"week_n")
  }

  val q119Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |cohort AS (
      |  SELECT user_id,
      |    CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      |  FROM ev WHERE event_type = 'signup' GROUP BY user_id),
      |act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS act_week
      |  FROM ev),
      |j AS (
      |  SELECT c.cohort_week,
      |    date_diff('day', c.cohort_week, a.act_week) // 7 AS week_n
      |  FROM cohort c JOIN act a ON c.user_id = a.user_id
      |  WHERE a.act_week >= c.cohort_week)
      |SELECT cohort_week, week_n, COUNT(*) AS n_active
      |FROM j
      |GROUP BY cohort_week, week_n
      |ORDER BY cohort_week, week_n""".stripMargin

  /** q99 — runtime bloom-filter join pruning, the registered form of the
    * recipe RuntimeFilterSpec pins: a selective dim-side filter (urgent,
    * high-value orders) becomes a bloom filter probed at the lineitem
    * scan, so most fact rows die BEFORE the join shuffle — the 100 TB
    * analogue of the reference's prune-before-read partition walk
    * (cache.go:107, main.go:226).
    *
    * Session-conf scoping: Spark's `InjectRuntimeFilter` only fires
    * under confs a shared bench/verify session doesn't run with
    * (shuffle-join regime + zero application-side size threshold at
    * test scale), so the confs are set HERE, the plan is asserted to
    * carry the bloom probe (`might_contain`), the result is
    * materialized under those confs via `localCheckpoint()`, and the
    * original confs are restored before returning — later queries in
    * the same session see no change.
    */
  val q99BloomPrunedJoin: Q = (s, dir) => {
    import s.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // sf-test plans sit far below the 10 GiB default application-side
      // threshold that gates injection at real scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // injection targets probable SHUFFLE joins — the 100 TB regime;
      // disable auto-broadcast so the test join takes that path
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val urgent = T.orders(s, dir)
        .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 250000.0)
      val result = T.lineitem(s, dir)
        .join(urgent, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          dsl.dsumExpr($"l_quantity").as("qty"))
        .orderBy($"o_orderpriority")
      val plan = result.queryExecution.optimizedPlan.toString
      require(plan.contains("might_contain"),
        s"bloom runtime filter not injected; optimized plan:\n$plan")
      result.localCheckpoint()
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  val q99Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
       |  ${O.dsumExpr("l_quantity")} AS qty
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000.0
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** q148 — attribution lookback horizon (µs). */
  val AttributionWindowUs: Long = 7L * 24 * 3600 * 1000000

  /** q148 — LAST-TOUCH marketing attribution (3rd event-analytics shape
    * next to q94's funnel and q119's retention): every purchase is
    * credited to the user's most recent prior view/click within a
    * 7-day lookback; purchases with no eligible touch report as
    * 'none'. Revenue sums take the exact decimal path (dsl.dsum).
    *
    * Scale shape: the touch lookup is ONE keyed window (`last(...,
    * ignoreNulls)` over rows preceding) — no self-join, no as-of
    * shuffle; the only exchanges are the user_id window partition and
    * the tiny per-channel groupBy. Ordering inside the window is
    * (ts, event_id), deterministic under timestamp ties in both
    * engines.
    */
  val q148LastTouchAttribution: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when($"event_type".isin("view", "click"),
      struct(unix_micros($"ts").as("t_us"), $"event_type".as("ch")))
    T.events(s, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .withColumn("channel",
        when($"lt".isNotNull &&
          unix_micros($"ts") - $"lt.t_us" <= AttributionWindowUs, $"lt.ch")
          .otherwise(lit("none")))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"), dsl.dsum($"value").as("revenue"))
      .orderBy($"channel")
  }

  val q148Sql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    event_type, value
       |  FROM events),
       |t AS (
       |  SELECT event_type, value, ts,
       |    LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
       |        THEN struct_pack(t_us := epoch_us(ts), ch := event_type)
       |      END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
       |  FROM ev),
       |p AS (
       |  SELECT CASE WHEN lt IS NOT NULL
       |           AND epoch_us(ts) - lt.t_us <= $AttributionWindowUs
       |         THEN lt.ch ELSE 'none' END AS channel, value
       |  FROM t WHERE event_type = 'purchase')
       |SELECT channel, COUNT(*) AS n_purchases,
       |  ${O.dsum("value")} AS revenue
       |FROM p GROUP BY channel ORDER BY channel""".stripMargin

  /** q150 — session gap (µs), q120's constant. */
  val TransitionGapUs: Long = 30L * 60 * 1000000

  /** q150 — event-transition matrix (Markov pathing): within q120-style
    * gap sessions, count every (prev_event_type → event_type) step —
    * the input to next-action prediction and funnel-drop diagnosis.
    *
    * Scale shape: sessionization and the transition pairing are the
    * SAME keyed window (one user_id exchange, two lag projections);
    * the matrix groupBy partial-aggregates to ≤ |types|² rows.
    */
  val q150EventTransitions: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    T.events(s, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
      .withColumn("prev_type", lag($"event_type", 1).over(wOrd))
      .filter($"prev_ts".isNotNull &&
        unix_micros($"ts") - unix_micros($"prev_ts") <= TransitionGapUs)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"prev_type", $"next_type")
  }

  val q150Sql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
       |  FROM events),
       |l AS (
       |  SELECT event_type,
       |    LAG(ts) OVER w AS prev_ts,
       |    LAG(event_type) OVER w AS prev_type,
       |    ts
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT prev_type, event_type AS next_type, COUNT(*) AS n
       |FROM l
       |WHERE prev_ts IS NOT NULL
       |  AND date_diff('microsecond', prev_ts, ts) <= $TransitionGapUs
       |GROUP BY prev_type, next_type
       |ORDER BY prev_type, next_type""".stripMargin

  /** q152 — consecutive-day activity streaks (the islands-and-gaps SQL
    * pattern): per user, runs of consecutive active DAYS collapse to
    * islands via the date-minus-row_number trick (a constant within one
    * run, distinct across runs), then per-user streak stats — the
    * engagement/continuity metric behind "N-day streak" features and
    * activity-gap audits.
    *
    * Scale shape: distinct (user, day) first (partial-aggregated — the
    * raw event volume never reaches the window), then ONE keyed window
    * and two partial-aggregated groupBys, all on the user_id
    * partitioning.
    */
  val q152ActivityStreaks: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"day")
    T.events(s, dir)
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
      .withColumn("island", date_sub($"day", row_number().over(w)))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("len"), min($"day").as("start_day"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_streaks"),
        max($"len").as("max_streak"),
        min($"start_day").as("first_day"))
      .orderBy($"user_id")
  }

  val q152Sql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      |  FROM events),
      |i AS (
      |  SELECT user_id, day,
      |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
      |               AS INTEGER) AS island
      |  FROM d),
      |st AS (
      |  SELECT user_id, island, COUNT(*) AS len, MIN(day) AS start_day
      |  FROM i GROUP BY user_id, island)
      |SELECT user_id, COUNT(*) AS n_streaks, MAX(len) AS max_streak,
      |  MIN(start_day) AS first_day
      |FROM st
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q153 — TPC-H Q10 shape (returned-item revenue): customers ranked
    * by revenue lost to returned lines in one quarter, with nation
    * context — the 4-table join + decimal-exact revenue + top-k
    * headliner next to q82 (Q3) and q83 (Q5).
    *
    * Scale shape: date + returnflag filters push to the scans; nation
    * (25 rows) is the only hard broadcast; the customer and order
    * edges stay AQE-governed (both scale with SF); top-k is
    * TakeOrderedAndProject, never a global sort.
    */
  val q153ReturnedItems: Q = (s, dir) => {
    import s.implicits._
    val lo = lit("1996-01-01").cast(TimestampType)
    val hi = lit("1996-04-01").cast(TimestampType)
    val ords = T.orders(s, dir)
      .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
    val lines = T.lineitem(s, dir).filter($"l_returnflag" === "R")
    lines.join(ords, $"l_orderkey" === $"o_orderkey")
      .join(T.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(T.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(dsl.dsumExpr($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey".asc)
      .limit(20)
  }

  val q153Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${O.dsumExpr("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1996-04-01'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  /** q165 — TPC-H Q18 shape (large-volume orders): orders whose total
    * line quantity exceeds a threshold, with customer context — the
    * HAVING-subquery + 3-table join headliner next to q82/q83/q153.
    *
    * Scale shape: the qualifying-order set comes from ONE
    * partial-aggregated groupBy on l_orderkey with the HAVING applied
    * before any join (the semi-join side is ∝ qualifying orders, not
    * lineitem); the lineitem re-aggregation joins on the same
    * l_orderkey partitioning; top-k is TakeOrderedAndProject.
    */
  val Q18QtyThreshold = 300L

  val q165LargeVolume: Q = (s, dir) => {
    import s.implicits._
    val lines = T.lineitem(s, dir)
      .select($"l_orderkey", $"l_quantity".cast("long").as("qty"))
    val big = lines.groupBy($"l_orderkey")
      .agg(sum($"qty").as("total_qty"))
      .filter($"total_qty" > Q18QtyThreshold)
    big.join(T.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(T.customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"total_qty")
      .orderBy($"o_totalprice".desc, $"o_orderdate".asc, $"o_orderkey".asc)
      .limit(100)
  }

  val q165Sql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
       |    AS total_qty
       |  FROM lineitem
       |  GROUP BY l_orderkey
       |  HAVING SUM(CAST(l_quantity AS BIGINT)) > $Q18QtyThreshold)
       |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       |  total_qty
       |FROM big
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
       |LIMIT 100""".stripMargin

  /** q173 — TPC-H Q21 shape (sole-fault supplier): suppliers with a
    * returned line on multi-supplier orders where NO other supplier's
    * line was returned — the EXISTS + NOT EXISTS correlated-subquery
    * double, planned as one left-semi and one left-anti join against
    * aliased lineitem (the returnflag stands in for the
    * receipt>commit lateness test; this fixture has no receipt dates).
    *
    * Scale shape: both probes are equi-joins on l_orderkey with a
    * residual supplier-inequality — hash-partitioned on the order key,
    * no correlated per-row subquery execution; the fact table is
    * reduced to distinct (order, supplier) pairs BEFORE any probe.
    */
  val q173SoleFault: Q = (s, dir) => {
    import s.implicits._
    val pairs = T.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
    val all = pairs.select($"l_orderkey", $"l_suppkey").distinct()
    val ret = pairs.filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_suppkey").distinct()
    val multi = ret.as("a").join(all.as("b"),
      $"a.l_orderkey" === $"b.l_orderkey" &&
        $"a.l_suppkey" =!= $"b.l_suppkey", "left_semi")
    val sole = multi.as("a").join(ret.as("c"),
      $"a.l_orderkey" === $"c.l_orderkey" &&
        $"a.l_suppkey" =!= $"c.l_suppkey", "left_anti")
    sole.groupBy($"l_suppkey".as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_suppkey".asc)
      .limit(20)
  }

  val q173Sql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      |ret AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      |  WHERE l_returnflag = 'R')
      |SELECT a.l_suppkey AS s_suppkey, COUNT(*) AS numwait
      |FROM ret a
      |WHERE EXISTS (SELECT 1 FROM pairs b
      |        WHERE b.l_orderkey = a.l_orderkey
      |          AND b.l_suppkey <> a.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM ret c
      |        WHERE c.l_orderkey = a.l_orderkey
      |          AND c.l_suppkey <> a.l_suppkey)
      |GROUP BY a.l_suppkey
      |ORDER BY numwait DESC, s_suppkey ASC
      |LIMIT 20""".stripMargin

  /** Register the TPC-H-ish tables as temp views so the two
    * correlated-subquery shapes below can be stated in SQL — the POINT
    * of q181/q182 is to run through Catalyst's decorrelation rules
    * (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery) rather
    * than a hand-decorrelated DataFrame join like q30/q165/q173.
    */
  private def registerViews(s: SparkSession, dir: String): Unit = {
    T.part(s, dir).createOrReplaceTempView("part")
    T.supplier(s, dir).createOrReplaceTempView("supplier")
    T.lineitem(s, dir).createOrReplaceTempView("lineitem")
    T.nation(s, dir).createOrReplaceTempView("nation")
    T.region(s, dir).createOrReplaceTempView("region")
    T.customer(s, dir).createOrReplaceTempView("customer")
    T.orders(s, dir).createOrReplaceTempView("orders")
  }

  /** q181 — TPC-H Q2 shape (minimum-cost supplier): for each PROMO part,
    * the European supplier rows whose line price equals the minimum
    * European line price for that part — a correlated SCALAR AGGREGATE
    * subquery over a 4-table join, correlated on the outer part key.
    * (This fixture has no partsupp table; lineitem stands in as the
    * part×supplier price relation, exactly the join depth Q2's inner
    * block has.)
    *
    * Scale shape: Catalyst decorrelates the inner MIN into ONE
    * aggregate over the (filtered) join keyed by l_partkey plus an
    * equi-join back on (partkey, price) — never a per-outer-row
    * subquery execution; DecorrelationSpec pins the rewritten plan
    * (no scalar-subquery expression survives optimization). The region
    * filter reduces both sides before their join; nation/region are
    * fixed-cardinality broadcasts.
    */
  val q181MinCostSupplier: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql(q181Sql)
  }

  val q181Sql: String =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  l_extendedprice AS min_cost
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_type = 'PROMO'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  /** q182 — TPC-H Q20 shape (excess-volume suppliers): suppliers who in
    * 1996 shipped MORE THAN HALF of the 1996 volume of some 'gear'
    * part — a nested IN whose inner block carries a correlated scalar
    * aggregate in its HAVING (the inner SUM correlates on the middle
    * block's group key). The group/correlation key is the PART-side
    * p_partkey deliberately: an unqualified lineitem column name inside
    * the subquery would bind to the inner l2 scope (both engines prefer
    * the nearest scope), silently turning the correlation into a
    * tautology — DecorrelationSpec would catch the uncorrelated plan.
    * The volume compare is integer-exact
    * (2·sum96 > sumAll on BIGINT-cast quantities), so both engines
    * agree without float slack.
    *
    * Scale shape: the IN becomes a left-semi join on s_suppkey; the
    * correlated HAVING sum becomes one aggregate over lineitem keyed by
    * l_partkey joined back on the group key — both reductions happen
    * BEFORE any row reaches supplier. DecorrelationSpec pins the plan
    * (a LeftSemi join, zero surviving subquery expressions).
    */
  val q182ExcessVolume: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql(q182Sql)
  }

  val q182Sql: String =
    """SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%gear%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_suppkey, p_partkey
      |  HAVING 2 * SUM(CAST(l_quantity AS BIGINT)) > (
      |    SELECT SUM(CAST(l2.l_quantity AS BIGINT))
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      |      AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
      |      AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
      |ORDER BY s_suppkey""".stripMargin

  /** q188 — RECURSIVE CTE (Spark 4's WITH RECURSIVE): breadth-bounded
    * reachability over the gear-family co-purchase subgraph ("which
    * gear parts are transitively co-purchased with the first one") —
    * the DECLARATIVE
    * sibling of the hand-rolled iterative fixpoints (PageRank q138,
    * connected components q101): the engine drives the loop, each
    * recursion step is one distributed self-join against the working
    * set. Spark 4.1 supports only UNION ALL recursion, so the
    * recursive member carries its own DISTINCT: the working set stays a
    * node-set per step (bounded by |nodes|·depths) instead of a PATH
    * multiset, which would explode combinatorially on a dense
    * co-purchase graph. Output is nodes first-reached per depth from
    * the smallest part key.
    *
    * Scale shape: each step is an equi-join of the frontier against the
    * edge list (hash-partitioned on the node id) + a distinct — exactly
    * the per-round plan ConnectedComponents builds by hand; the depth
    * bound caps the rounds. The edge list is loop-INVARIANT, but a CTE
    * referenced from inside the recursion is re-inlined into EVERY
    * step — measured at sf0.1: 7.5 s with the full-graph self-join
    * recomputed once per round, 5.3 s materialized once
    * (localCheckpoint + temp view, the PageRank discipline), well under
    * 1 s on the family subgraph a reachability question actually
    * targets. The oracle keeps the single-statement form (DuckDB
    * evaluates its CTE once).
    */
  val q188RecursiveReach: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql(
      """WITH gl AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%gear%')
        |SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |FROM gl a JOIN gl b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"""
        .stripMargin)
      .localCheckpoint()
      .createOrReplaceTempView("copurchase_edges")
    s.sql(
      """WITH RECURSIVE reach(node, depth) AS (
        |  SELECT (SELECT MIN(u) FROM copurchase_edges), 0
        |  UNION ALL
        |  SELECT DISTINCT e.v, r.depth + 1
        |  FROM reach r JOIN copurchase_edges e ON e.u = r.node
        |  WHERE r.depth < 3),
        |first_seen AS (
        |  SELECT node, MIN(depth) AS d FROM reach GROUP BY node)
        |SELECT d, COUNT(*) AS n_nodes
        |FROM first_seen
        |GROUP BY d
        |ORDER BY d""".stripMargin)
  }

  val q188Sql: String =
    """WITH RECURSIVE gl AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%gear%'),
      |edges AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM gl a JOIN gl b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      |reach(node, depth) AS (
      |  SELECT (SELECT MIN(u) FROM edges), 0
      |  UNION ALL
      |  SELECT DISTINCT e.v, r.depth + 1
      |  FROM reach r JOIN edges e ON e.u = r.node
      |  WHERE r.depth < 3),
      |first_seen AS (
      |  SELECT node, MIN(depth) AS d FROM reach GROUP BY node)
      |SELECT d, COUNT(*) AS n_nodes
      |FROM first_seen
      |GROUP BY d
      |ORDER BY d""".stripMargin

  /** q189 — LATERAL correlated subquery (per-customer top-2 orders):
    * the third decorrelation surface next to q181's scalar aggregate
    * and q182's nested IN — a correlated LIMIT block the optimizer must
    * turn into a windowed/joined plan instead of re-running the inner
    * query per customer row. Same answer as the q18 window spelling,
    * which the spec pins row-for-row.
    */
  val q189LateralTopk: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql(q189Sql)
  }

  val q189Sql: String =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer,
      |  LATERAL (
      |    SELECT o_orderkey, o_totalprice FROM orders
      |    WHERE o_custkey = c_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** q248 — RFM customer segmentation (recency / frequency / monetary
    * quartiles): the classic lifecycle-marketing rollup — per customer,
    * last order date, order count, and decimal-exact lifetime spend,
    * each cut into quartiles by NTILE(4) under a TOTAL order (metric +
    * c_custkey tiebreak — a bare metric order leaves quartile
    * boundaries engine-dependent on ties), composed into the
    * three-digit segment label ('444' = best).
    *
    * Scale shape: one partial-aggregated groupBy(custkey) collapses
    * orders to one row per customer BEFORE the windows, so the three
    * global NTILE sorts run on the customer frame (≪ fact volume);
    * production swaps exact quartiles for approx_percentile cuts (the
    * q90/q247 convention).
    */
  val q248RfmSegments: Q = (s, dir) => {
    import s.implicits._
    val perCust = T.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last_order"),
        count(lit(1)).as("n_orders"),
        graft.core.dsl.dsum($"o_totalprice").as("spend"))
      .localCheckpoint() // three rank passes + the count share it
    // r18 (verdict item 5): NTILE(4) under a bare global order ran the
    // whole customer frame through ONE task per metric (guide §2.5);
    // each quartile now derives from fullRankGlobal's two-level rank
    // via the front-loaded-remainder formula BOTH engines define for
    // NTILE (first n mod k buckets one larger): with q = n div 4,
    // rem = n mod 4, rank r maps to (r+q) div (q+1) within the first
    // rem·(q+1) ranks and rem + (r − rem·(q+1) + q − 1) div q past
    // them — equivalence proven against DuckDB's literal NTILE by the
    // oracle compare (total order: metric + c_custkey, as before).
    import graft.relational.QuantileNormalize.fullRankGlobal
    def ntile4(rank: String): org.apache.spark.sql.Column = expr(
      s"""CASE WHEN $rank <= nrem * (nq + 1)
         |  THEN ($rank + nq) DIV (nq + 1)
         |  ELSE nrem + ($rank - nrem * (nq + 1) + nq - 1) DIV nq
         |END""".stripMargin)
    val nDf = perCust.agg(count(lit(1)).as("ncust"))
    fullRankGlobal(
      fullRankGlobal(
        fullRankGlobal(perCust,
          Seq($"last_order".asc, $"o_custkey".asc), "rr"),
        Seq($"n_orders".asc, $"o_custkey".asc), "rf"),
      Seq($"spend".asc, $"o_custkey".asc), "rm")
      .crossJoin(broadcast(nDf))
      .withColumn("nq", expr("ncust DIV 4"))
      .withColumn("nrem", expr("ncust % 4"))
      .withColumn("r_q", ntile4("rr")).withColumn("f_q", ntile4("rf"))
      .withColumn("m_q", ntile4("rm"))
      .select($"o_custkey", $"n_orders", $"spend", $"r_q", $"f_q", $"m_q",
        concat($"r_q", $"f_q", $"m_q").as("segment"))
      .orderBy($"o_custkey")
  }

  val q248Sql: String =
    s"""WITH pc AS (
       |  SELECT o_custkey, MAX(o_orderdate) AS last_order,
       |    COUNT(*) AS n_orders,
       |    ${graft.core.OracleDsl.dsum("o_totalprice")} AS spend
       |  FROM orders GROUP BY o_custkey)
       |SELECT o_custkey, n_orders, spend,
       |  NTILE(4) OVER (ORDER BY last_order ASC, o_custkey ASC) AS r_q,
       |  NTILE(4) OVER (ORDER BY n_orders ASC, o_custkey ASC) AS f_q,
       |  NTILE(4) OVER (ORDER BY spend ASC, o_custkey ASC) AS m_q,
       |  CAST(NTILE(4) OVER (ORDER BY last_order ASC, o_custkey ASC) AS VARCHAR)
       |    || CAST(NTILE(4) OVER (ORDER BY n_orders ASC, o_custkey ASC) AS VARCHAR)
       |    || CAST(NTILE(4) OVER (ORDER BY spend ASC, o_custkey ASC) AS VARCHAR)
       |    AS segment
       |FROM pc
       |ORDER BY o_custkey""".stripMargin

  /** q362 — correlated LATERAL subquery with per-row ORDER BY+LIMIT
    * (the SQL-standard spelling of "top-2 orders per customer" — the
    * surface q156's TopKPerGroup custom plan and q18's window
    * spelling expose through the DataFrame API, here as the literal
    * LATERAL both engines now parse): Spark decorrelates the
    * correlated limit into a keyed window plan (the
    * DecorrelationSpec family — no per-customer re-execution
    * survives into the physical plan), DuckDB runs its own lateral
    * join; the two must agree row-for-row under the deterministic
    * (cents DESC, o_orderkey) tie order.
    *
    * Scale shape: after decorrelation this is ONE customer-keyed
    * window over orders — no nested-loop per-row subquery; customers
    * without orders drop out in both engines (inner lateral).
    */
  val q362LateralTopk: Q = (s, dir) => {
    T.customer(s, dir).createOrReplaceTempView("q362_customer")
    T.orders(s, dir).createOrReplaceTempView("q362_orders")
    s.sql(
      """SELECT c.c_custkey, l.o_orderkey, l.cents
        |FROM q362_customer c,
        |LATERAL (
        |  SELECT o_orderkey,
        |    CAST(FLOOR(100 * o_totalprice) AS BIGINT) AS cents
        |  FROM q362_orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY cents DESC, o_orderkey
        |  LIMIT 2) l
        |ORDER BY c.c_custkey, l.cents DESC, l.o_orderkey""".stripMargin)
  }

  val q362Sql: String =
    """SELECT c.c_custkey, l.o_orderkey, l.cents
      |FROM customer c,
      |LATERAL (
      |  SELECT o_orderkey,
      |    CAST(FLOOR(100 * o_totalprice) AS BIGINT) AS cents
      |  FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY cents DESC, o_orderkey
      |  LIMIT 2) l
      |ORDER BY c.c_custkey, l.cents DESC, l.o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q362_lateral_topk" -> q362LateralTopk,
    "q248_rfm_segments" -> q248RfmSegments,
    "q82_shipping_priority" -> q82ShippingPriority,
    "q83_local_supplier_volume" -> q83LocalSupplierVolume,
    "q94_funnel" -> q94Funnel,
    "q99_bloom_pruned_join" -> q99BloomPrunedJoin,
    "q119_cohort_retention" -> q119CohortRetention,
    "q148_last_touch_attribution" -> q148LastTouchAttribution,
    "q150_event_transitions" -> q150EventTransitions,
    "q152_activity_streaks" -> q152ActivityStreaks,
    "q153_returned_items" -> q153ReturnedItems,
    "q165_large_volume" -> q165LargeVolume,
    "q173_sole_fault" -> q173SoleFault,
    "q181_min_cost_supplier" -> q181MinCostSupplier,
    "q182_excess_volume" -> q182ExcessVolume,
    "q188_recursive_reach" -> q188RecursiveReach,
    "q189_lateral_topk" -> q189LateralTopk,
  )

  val oracleSql: Map[String, String] = Map(
    "q362_lateral_topk" -> q362Sql,
    "q248_rfm_segments" -> q248Sql,
    "q181_min_cost_supplier" -> q181Sql,
    "q182_excess_volume" -> q182Sql,
    "q188_recursive_reach" -> q188Sql,
    "q189_lateral_topk" -> q189Sql,
    "q82_shipping_priority" -> q82Sql,
    "q83_local_supplier_volume" -> q83Sql,
    "q94_funnel" -> q94Sql,
    "q99_bloom_pruned_join" -> q99Sql,
    "q119_cohort_retention" -> q119Sql,
    "q148_last_touch_attribution" -> q148Sql,
    "q150_event_transitions" -> q150Sql,
    "q152_activity_streaks" -> q152Sql,
    "q153_returned_items" -> q153Sql,
    "q165_large_volume" -> q165Sql,
    "q173_sole_fault" -> q173Sql,
  )
}
