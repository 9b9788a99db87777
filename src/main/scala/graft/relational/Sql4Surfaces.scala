package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Tables => T}

/** Two more Spark 4 SQL surfaces proven against the oracle, in the
  * q349/q359 "certify the native surface" discipline: the |> pipe
  * operator (SPARK-49555, the linear query-authoring syntax) and
  * string collations (SPARK-46830 — comparison/grouping semantics as
  * a TYPE property instead of lower() rewrites scattered through the
  * query).
  */
object Sql4Surfaces {

  type Q = (SparkSession, String) => DataFrame

  /** q367 — SQL PIPE syntax: the literal `FROM … |> WHERE …
    * |> AGGREGATE … |> ORDER BY` program, gated against the classic
    * spelling DuckDB runs — the parser surface is the thing under
    * test; the optimized plan is identical to the classic query's
    * (pipe stages lower to the same logical operators, so there is
    * no plan-shape cost to the new syntax).
    */
  val q367PipeSyntax: Q = (s, dir) => {
    T.lineitem(s, dir).createOrReplaceTempView("q367_lineitem")
    s.sql(
      """FROM q367_lineitem
        ||> WHERE l_quantity > 30
        ||> AGGREGATE COUNT(*) AS n,
        |     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |     GROUP BY l_returnflag
        ||> ORDER BY l_returnflag""".stripMargin)
  }

  val q367Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem
      |WHERE l_quantity > 30
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q368 — UTF8_LCASE COLLATION grouping: a deterministically
    * mixed-case rendering of p_brand (upper for even keys, lower for
    * odd) groups under the case-insensitive collation exactly as the
    * oracle's lower() rewrite groups — the semantics a catalog
    * declares ONCE on the column type instead of remembering lower()
    * at every call site. The collated group key is cast back to a
    * plain string for the output (parquet/hash-compare surface stays
    * binary UTF8).
    */
  val q368CollationGroup: Q = (s, dir) => {
    T.part(s, dir).createOrReplaceTempView("q368_part")
    s.sql(
      """SELECT CAST(lower(k) AS STRING) AS brand_lc,
        |  COUNT(*) AS n
        |FROM (
        |  SELECT COLLATE(CASE WHEN p_partkey % 2 = 0
        |      THEN upper(p_brand) ELSE lower(p_brand) END,
        |    'UTF8_LCASE') AS k
        |  FROM q368_part)
        |GROUP BY k
        |ORDER BY brand_lc""".stripMargin)
  }

  val q368Sql: String =
    """SELECT lower(CASE WHEN p_partkey % 2 = 0
      |    THEN upper(p_brand) ELSE lower(p_brand) END) AS brand_lc,
      |  COUNT(*) AS n
      |FROM part
      |GROUP BY 1
      |ORDER BY brand_lc""".stripMargin

  val queries: Map[String, Q] = Map(
    "q367_pipe_syntax" -> q367PipeSyntax,
    "q368_collation_group" -> q368CollationGroup)
  val oracleSql: Map[String, String] = Map(
    "q367_pipe_syntax" -> q367Sql,
    "q368_collation_group" -> q368Sql)
}
