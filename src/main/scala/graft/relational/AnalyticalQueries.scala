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
  *   - q82 (Q3): dim-filtered customer broadcasts into orders, the
  *     result (still small after the date filter) joins lineitem — ONE
  *     fact shuffle at most; top-k via TakeOrderedAndProject.
  *   - q83 (Q5): region→nation→{customer,supplier} is a broadcast chain
  *     of tiny dims; the only big edge is lineitem⋈orders. The
  *     same-nation predicate (local supplier) lands as a join filter,
  *     never a post-join cross check.
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
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
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
      .join(broadcast(T.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(T.customer(s, dir)),
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

  val queries: Map[String, Q] = Map(
    "q82_shipping_priority" -> q82ShippingPriority,
    "q83_local_supplier_volume" -> q83LocalSupplierVolume,
  )

  val oracleSql: Map[String, String] = Map(
    "q82_shipping_priority" -> q82Sql,
    "q83_local_supplier_volume" -> q83Sql,
  )
}
