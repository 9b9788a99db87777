package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.AsOfJoin

/** Contracts for the native as-of merge join (q224): row-for-row parity
  * with the union+window composition it replaces, outer semantics, and
  * the physical-plan shape EnsureRequirements is expected to build.
  */
class AsOfMergeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def sides(): (DataFrame, DataFrame) = {
    val ev = graft.core.Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id", $"ts".as("signup_ts"))
      .agg(max($"event_id").as("signup_id"))
    (purchases, signups)
  }

  test("native inner as-of equals the union+window composition") {
    val (p, s) = sides()
    val native = AsOfMergeJoin.backward(p, s, Seq("user_id"), "ts", "signup_ts")
      .select($"purchase_id", $"signup_id")
      .as[(Long, Long)].collect().toSet
    val composed = AsOfJoin.backward(p, s, Seq("user_id"), "ts", "signup_ts")
      .select($"purchase_id", $"signup_id")
      .as[(Long, Long)].collect().toSet
    assert(native.nonEmpty && native == composed,
      s"native ${native.size} rows vs composed ${composed.size}")
  }

  test("native outer as-of keeps unmatched lefts with null payload") {
    val (p, s) = sides()
    val native = AsOfMergeJoin.backward(p, s, Seq("user_id"), "ts",
        "signup_ts", keepUnmatched = true)
      .select($"purchase_id", $"signup_id")
      .as[(Long, Option[Long])].collect()
    val composed = AsOfJoin.backward(p, s, Seq("user_id"), "ts",
        "signup_ts", keepUnmatched = true)
      .select($"purchase_id", $"signup_id")
      .as[(Long, Option[Long])].collect()
    assert(native.length === p.count())
    assert(native.toSet === composed.toSet)
    assert(native.exists(_._2.isEmpty), "fixture should have orphan purchases")
  }

  test("random multi-key data: parity across partitionings") {
    // deterministic LCG data: keys 0..19 on the left, only 0..14 on the
    // right (keys with no right rows exercise the no-match walk), times
    // with cross-side ties (tie => rightTime <= leftTime matches)
    var x = 12345L
    def nxt(m: Int): Int = { x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % m).toInt }
    val lRows = Seq.tabulate(400)(i =>
      (i.toLong, nxt(20).toLong, new Timestamp(100000L + nxt(500) * 1000L)))
    val rRows = Seq.tabulate(300)(i =>
      (1000L + i, nxt(15).toLong, new Timestamp(100000L + nxt(500) * 1000L)))
      .distinct.groupBy(r => (r._2, r._3)).map(_._2.head).toSeq // unique (key, t)
    Seq(1, 3, 8).foreach { parts =>
      val l = lRows.toDF("lid", "k", "t").repartition(parts)
      val r = rRows.toDF("rid", "k", "rt").repartition(parts + 1)
      val native = AsOfMergeJoin.backward(l, r, Seq("k"), "t", "rt",
          keepUnmatched = true)
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toSet
      val composed = AsOfJoin.backward(l, r, Seq("k"), "t", "rt",
          keepUnmatched = true)
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toSet
      assert(native === composed, s"parity broke at $parts partitions")
    }
  }

  test("plan: merge exec present, no window, sorts delegated to SortExec") {
    val (p, s) = sides()
    val df = AsOfMergeJoin.backward(p, s, Seq("user_id"), "ts", "signup_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into the plan:\n$plan")
    assert(plan.contains("Sort "), s"expected SortExec children:\n$plan")
  }

  test("existing hash partitioning on the keys elides the exchange") {
    val (p, s) = sides()
    val pPre = p.repartition(4, $"user_id")
    val sPre = s.repartition(4, $"user_id")
    val plan = AsOfMergeJoin.backward(pPre, sPre, Seq("user_id"), "ts",
      "signup_ts").queryExecution.executedPlan.toString
    // the two explicit repartitions satisfy the join's distribution —
    // EnsureRequirements must not add its own single-key exchange on top
    // (the signups dedup aggregate legitimately keeps its two-key one)
    val added = """Exchange hashpartitioning\(user_id#\d+L?, \d+\), ENSURE_REQUIREMENTS"""
      .r.findAllIn(plan).length
    assert(added === 0, s"join added its own exchange:\n$plan")
    val explicit = "REPARTITION_BY_NUM".r.findAllIn(plan).length
    assert(explicit === 2, s"expected both explicit repartitions:\n$plan")
  }
}
