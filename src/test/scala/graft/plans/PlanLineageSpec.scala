package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-lineage extraction over adversarial plan shapes: aliasing
  * chains, self-joins (same leaf twice), windows, generators, unions,
  * and scalar subqueries — the cases where name-based (rather than
  * ExprId-based) lineage goes wrong.
  */
class PlanLineageSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def edges(df: org.apache.spark.sql.DataFrame)
      : Set[(String, String, String)] = PlanLineage.lineage(df).toSet

  test("alias chains resolve to leaf columns, not intermediate names") {
    val base = graft.core.Tables.lineitem(spark, sf)
      .select($"l_quantity".as("a"))
      .select(($"a" * 2).as("b"))
      .select(($"b" + 1).as("c"))
    assert(edges(base) == Set(("c", "lineitem", "l_quantity")))
  }

  test("self-join keeps both sides attributed to the same physical table") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val j = li.as("x").join(li.as("y"), $"x.l_orderkey" === $"y.l_orderkey")
      .select(($"x.l_quantity" + $"y.l_extendedprice").as("mix"))
    assert(edges(j) == Set(
      ("mix", "lineitem", "l_quantity"),
      ("mix", "lineitem", "l_extendedprice")))
  }

  test("window expressions trace partition/order inputs only via their value") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"l_shipdate")
    val df = graft.core.Tables.lineitem(spark, sf)
      .select($"l_returnflag",
        sum($"l_quantity").over(w).as("running"))
    val e = edges(df)
    // the window VALUE traces to l_quantity plus its frame-defining
    // columns (they are references of the window expression)
    assert(e.contains(("running", "lineitem", "l_quantity")))
    assert(e.contains(("l_returnflag", "lineitem", "l_returnflag")))
  }

  test("explode output traces to the exploded source column") {
    val df = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
    val e = edges(df)
    assert(e.contains(("tok", "documents", "text")))
    assert(e.contains(("doc_id", "documents", "doc_id")))
    assert(!e.exists(t => t._1 == "tok" && t._3 == "doc_id"))
  }

  test("union merges lineage positionally across different tables") {
    val a = graft.core.Tables.lineitem(spark, sf)
      .select($"l_quantity".cast("double").as("v"))
    val b = graft.core.Tables.orders(spark, sf)
      .select($"o_totalprice".cast("double").as("v"))
    val e = edges(a.unionByName(b))
    assert(e == Set(
      ("v", "lineitem", "l_quantity"),
      ("v", "orders", "o_totalprice")))
  }

  test("count(*) and literals report <none>") {
    val df = graft.core.Tables.orders(spark, sf)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), lit("x").as("tag"))
    val e = edges(df)
    assert(e.contains(("n", "<none>", "<none>")))
    assert(e.contains(("tag", "<none>", "<none>")))
    assert(e.contains(("o_orderstatus", "orders", "o_orderstatus")))
  }

  test("scalar subquery contributes the subquery plan's leaf columns") {
    graft.core.Tables.orders(spark, sf).createOrReplaceTempView("pl_orders")
    graft.core.Tables.lineitem(spark, sf).createOrReplaceTempView("pl_lineitem")
    val df = spark.sql(
      """SELECT o_orderkey,
        |  o_totalprice - (SELECT AVG(l_extendedprice) FROM pl_lineitem)
        |    AS above_avg
        |FROM pl_orders""".stripMargin)
    val e = edges(df)
    assert(e.contains(("above_avg", "orders", "o_totalprice")))
    assert(e.contains(("above_avg", "lineitem", "l_extendedprice")))
  }

  test("filter columns do not leak into output lineage (data, not control)") {
    val df = graft.core.Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "F")
      .select($"o_totalprice".as("tp"))
    assert(edges(df) == Set(("tp", "orders", "o_totalprice")))
  }

  test("q251 fixed report matches its pinned truth") {
    val got = PlanLineage.q251ColumnLineage(spark, sf)
      .as[(String, String, String)].collect().toSeq
    val want = Seq(
      ("last_ship", "lineitem", "l_shipdate"),
      ("n_lines", "<none>", "<none>"),
      ("o_orderpriority", "orders", "o_orderpriority"),
      ("revenue", "lineitem", "l_discount"),
      ("revenue", "lineitem", "l_extendedprice"))
    assert(got == want, s"lineage drifted: $got")
  }
}
