package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Tables => T}
import graft.sources.QuarantineIngest

/** Plan-shape and recount checks for q132/q133/q134. */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q132 stats legs scan exactly one column each (pruned ReadSchema)") {
    val plan = TableStatsQueries.q132TableStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    // every profiled column appears as a single-field ReadSchema — the
    // ANALYZE shape: N narrow column-chunk scans, never one wide scan
    Seq("struct<l_orderkey:bigint>", "struct<l_quantity:double>",
      "struct<l_returnflag:string>", "struct<l_shipdate:timestamp_ntz>")
      .foreach { s =>
        assert(plan.contains(s), s"missing pruned scan $s in plan:\n$plan")
      }
  }

  test("q132 stats agree with directly recomputed values") {
    val got = TableStatsQueries.q132TableStats(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val li = T.lineitem(spark, sfDir)
    val n = li.count()
    assert(got.values.forall(_._1 == n))
    assert(got.values.forall(_._2 == 0L), "fixtures carry no nulls")
    val ndvFlag = li.select(countDistinct($"l_returnflag")).first().getLong(0)
    assert(got("l_returnflag")._3 == ndvFlag)
  }

  test("q133 quarantine split accounts for every fixture line") {
    val got = QuarantineIngest.q133Quarantine(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sup = T.supplier(spark, sfDir)
      .select($"s_suppkey", $"s_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val corrupt = sup.count(t => t._1 % 7 == 3 || t._1 % 7 == 5)
    assert(got("quarantined")._1 == corrupt.toLong)
    assert(got("clean")._1 == (sup.length - corrupt).toLong)
    val cleanSum = sup.filter(t => t._1 % 7 != 3 && t._1 % 7 != 5)
      .map(t => BigDecimal(t._2).setScale(2)).sum
    assert(BigDecimal(got("clean")._2).setScale(2) == cleanSum)
    assert(got("quarantined")._2 == 0.0)
  }

  test("q134 pair counts match a direct per-pair recount") {
    val rows = TableStatsQueries.q134Cooccurrence(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "pairs ordered p1<p2")
    assert(rows.forall(_.getLong(2) >= 2L))
    // recount the top pair from the raw table
    val top = rows.head
    val n = T.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .filter($"l_partkey" === top.getLong(0) || $"l_partkey" === top.getLong(1))
      .groupBy($"l_orderkey").agg(countDistinct($"l_partkey").as("k"))
      .filter($"k" === 2).count()
    assert(n == top.getLong(2))
  }
}
