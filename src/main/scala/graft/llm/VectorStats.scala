package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}

/** Grouped vector aggregation — per-label centroid sums over the
  * embedding column, the building block behind class centroids,
  * cluster-quality metrics, and codebook refresh (VectorSearch's IVF
  * fits its codebook from a bounded sample; refreshing centroids from
  * the FULL corpus is this exact aggregation).
  *
  * Exactness: component values are quantized `floor(x * 1e6)` — one
  * exact-rounded IEEE multiply and a floor per element, identical in
  * Spark and DuckDB (the q123 scheme, VectorSearch.scala) — so the
  * centroid numerators are exact BIGINT sums with no float-summation
  * order sensitivity. A consumer divides `sum_q / (1e6 * n_vec)` to
  * recover the mean.
  *
  * Scale shape: posexplode multiplies rows by the dimension (×64 here),
  * then partial aggregation combines map-side per (label, dim) before
  * the single hash shuffle — the shuffled volume is |labels|·dim
  * partials per task, independent of corpus size. No UDF; the quantize
  * is codegen'd HOF-free column math after the explode.
  */
object VectorStats {

  type Q = (SparkSession, String) => DataFrame

  val QuantScale = 1000000.0

  /** q137 — exact per-label centroid numerators: for each (label, dim),
    * the BIGINT sum of quantized components and the vector count.
    */
  val q137GroupCentroid: Q = (s, dir) => {
    import s.implicits._
    T.embeddings(s, dir)
      .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
      .select($"label", $"dim",
        floor($"x".cast("double") * lit(QuantScale)).cast("long").as("q"))
      .groupBy($"label", $"dim")
      .agg(sum($"q").as("sum_q"), count(lit(1)).as("n_vec"))
      .orderBy($"label", $"dim")
  }

  val q137Sql: String =
    s"""SELECT label, i - 1 AS dim,
       |  CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * $QuantScale) AS BIGINT)) AS BIGINT) AS sum_q,
       |  COUNT(*) AS n_vec
       |FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
       |GROUP BY label, dim
       |ORDER BY label, dim""".stripMargin

  val queries: Map[String, Q] = Map("q137_group_centroid" -> q137GroupCentroid)
  val oracleSql: Map[String, String] = Map("q137_group_centroid" -> q137Sql)
}
