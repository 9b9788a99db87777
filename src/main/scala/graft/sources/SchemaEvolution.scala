package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Parquet schema evolution (SURVEY.md §2.b source surface): a table
  * whose later batches added a column must stay readable as ONE
  * relation, with the old batches' missing column as null — the
  * mergeSchema read every long-lived warehouse table eventually needs
  * (the reference re-reads whole directories on any change —
  * cache.go:79-117 — and has no schema story at all).
  *
  * The fixture is two parquet files written with DIFFERENT schemas
  * (batch1: key+name; batch2: key+name+region). Spark reads them with
  * `mergeSchema=true`; the oracle reads the same two files with
  * DuckDB's independent `union_by_name=true` — two engines' separate
  * schema-evolution implementations must agree on the unified relation.
  *
  * Scale note: mergeSchema reads EVERY file footer at planning time —
  * fine per-batch, wrong as a default on a 100k-file table; production
  * tables pin the evolved schema in a catalog and pass it explicitly
  * (`spark.read.schema(current)`), which reads zero extra footers. The
  * query exercises the merge semantics; the scaladoc records the
  * catalog-pinned form as the at-scale default.
  */
object SchemaEvolution {

  type Q = (SparkSession, String) => DataFrame

  /** Fixed absolute dir so the static oracle SQL can address it. */
  val FixtureDir = "/root/repo/target/fixtures/evo"

  /** Write one batch as a single parquet FILE (tmp dir write + move the
    * part file to a stable name, q91/compaction pattern).
    */
  private def writeOneFile(df: DataFrame, target: Path): Unit = {
    val tmp = Files.createTempDirectory("evo_batch").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeFixture(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val nation = T.nation(s, dir)
    writeOneFile(
      nation.filter($"n_nationkey" < 13)
        .select($"n_nationkey", $"n_name"),
      Paths.get(FixtureDir, "batch1.parquet"))
    writeOneFile(
      nation.filter($"n_nationkey" >= 13)
        .select($"n_nationkey", $"n_name", $"n_regionkey"),
      Paths.get(FixtureDir, "batch2.parquet"))
  }

  /** q144 — merged-schema read over evolving batches: old rows surface
    * the added column as null.
    */
  val q144SchemaEvolution: Q = (s, dir) => {
    import s.implicits._
    writeFixture(s, dir)
    s.read.option("mergeSchema", "true").parquet(FixtureDir)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .orderBy($"n_nationkey")
  }

  val q144Sql: String =
    s"""SELECT n_nationkey, n_name, n_regionkey
       |FROM read_parquet('$FixtureDir/*.parquet', union_by_name=true)
       |ORDER BY n_nationkey""".stripMargin

  val queries: Map[String, Q] = Map("q144_schema_evolution" -> q144SchemaEvolution)
  val oracleSql: Map[String, String] = Map("q144_schema_evolution" -> q144Sql)
}
