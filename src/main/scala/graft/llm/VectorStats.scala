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

  /** q249 — embedding data-QUALITY audit (q107's sibling for the
    * vector table — the gate before any index build): per label, the
    * vector count, dimension-consistency check (every vector must have
    * the modal dimensionality), zero-vector count (an all-zero
    * embedding is an upstream encoder failure and poisons cosine
    * math), non-finite component count (NaN/Inf — quantized arithmetic
    * silently absorbs them otherwise), and the exact quantized norm²
    * sum (the magnitude-drift axis: a batch of mis-scaled vectors
    * shifts it by orders of magnitude).
    *
    * Exactness: norm² is the Σq² BIGINT of floor(x·1e4)-quantized
    * components (the q151 covariance budget — squares, so the coarser
    * scale), summed per label; all other columns are exact integer
    * counts. One narrow HOF projection + one partial-aggregated
    * groupBy(label).
    */
  val q249VectorAudit: Q = (s, dir) => {
    import s.implicits._
    val q = transform($"embedding",
      x => floor(x.cast("double") * lit(10000.0)).cast("long"))
    T.embeddings(s, dir)
      .select($"label", $"vec_id",
        size($"embedding").as("dim"),
        expr("""CAST(size(filter(embedding,
          |  x -> isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE))) AS LONG)"""
          .stripMargin).as("n_bad"),
        expr("""CAST(IF(size(filter(embedding, x -> CAST(x AS DOUBLE) != 0.0)) = 0, 1, 0) AS LONG)""")
          .as("is_zero"),
        aggregate(q, lit(0L), (acc, v) => acc + v * v).as("norm2_q"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vec"),
        countDistinct($"dim").as("n_dims_seen"),
        min($"dim").as("min_dim"), max($"dim").as("max_dim"),
        sum($"is_zero").as("n_zero_vec"),
        sum($"n_bad").as("n_nonfinite"),
        sum($"norm2_q").as("sum_norm2_q"))
      .orderBy($"label")
  }

  val q249Sql: String =
    """SELECT label, COUNT(*) AS n_vec,
      |  COUNT(DISTINCT len(embedding)) AS n_dims_seen,
      |  MIN(len(embedding)) AS min_dim, MAX(len(embedding)) AS max_dim,
      |  CAST(SUM(CASE WHEN len(list_filter(embedding,
      |    x -> CAST(x AS DOUBLE) != 0.0)) = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_zero_vec,
      |  CAST(SUM(len(list_filter(embedding,
      |    x -> isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE)))) AS BIGINT)
      |    AS n_nonfinite,
      |  CAST(SUM(list_sum(list_transform(embedding, x ->
      |    CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)
      |      * CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)))) AS BIGINT)
      |    AS sum_norm2_q
      |FROM embeddings
      |GROUP BY label
      |ORDER BY label""".stripMargin

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

  /** q151 quantization: coarser than q137's 1e6 because COVARIANCE sums
    * PRODUCTS of components — at scale 1e4 a product is ≤ ~3.6·10⁷ for
    * |x| < 0.6-ish components, so the int64 partial sum holds to ~10⁹
    * vectors (3.6·10¹⁶ ≪ 2⁶³); scale 1e6 would overflow past ~10⁴.
    */
  val CovQuantScale = 10000.0

  /** q151 — exact upper-triangle covariance numerators over the
    * embedding matrix: for each dimension pair (i ≤ j), the BIGINT sum
    * of quantized component products and the vector count — the Gram /
    * scatter matrix a PCA or whitening step consumes (covariance =
    * (n·Σqᵢqⱼ − SᵢSⱼ)/n² with the marginals Sᵢ from q137's centroid
    * numerators; the d×d eigen-solve on the RESULT is a driver-side
    * O(d³) on a constant-size matrix, never a cluster job).
    *
    * Scale shape: the d(d+1)/2 products are built per row by nested
    * array HOFs (codegen, no join — the posexplode-then-self-join
    * spelling would shuffle the corpus on vec_id for a product the row
    * already holds), then ONE explode feeds a partial-aggregated
    * groupBy on (i, j): shuffled volume is ≤ tasks · d(d+1)/2
    * partials, corpus-size independent — the q137 shape squared.
    */
  val q151EmbeddingCovariance: Q = (s, dir) => {
    import s.implicits._
    val q = transform($"embedding",
      x => floor(x.cast("double") * lit(CovQuantScale)).cast("long"))
    T.embeddings(s, dir)
      .select(q.as("q"))
      .select(explode(flatten(transform(
        sequence(lit(0), size($"q") - 1),
        i => transform(
          sequence(i, size($"q") - 1),
          j => struct(i.cast("long").as("i"), j.cast("long").as("j"),
            (element_at($"q", i + 1) * element_at($"q", j + 1)).as("p"))))))
        .as("e"))
      .groupBy($"e.i".as("i"), $"e.j".as("j"))
      .agg(count(lit(1)).as("n_vec"), sum($"e.p").as("sum_pq"))
      .orderBy($"i", $"j")
  }

  val q151Sql: String =
    s"""SELECT a.i - 1 AS i, b.j - 1 AS j, COUNT(*) AS n_vec,
       |  CAST(SUM(
       |    CAST(FLOOR(CAST(embedding[a.i] AS DOUBLE) * $CovQuantScale) AS BIGINT)
       |    * CAST(FLOOR(CAST(embedding[b.j] AS DOUBLE) * $CovQuantScale) AS BIGINT)
       |  ) AS BIGINT) AS sum_pq
       |FROM embeddings, unnest(range(1, len(embedding) + 1)) AS a(i),
       |     unnest(range(a.i, len(embedding) + 1)) AS b(j)
       |GROUP BY i, j
       |ORDER BY i, j""".stripMargin

  /** q262 — bucket count for the per-dimension quantile transform. */
  val QuantileBins = 10

  /** q262 — per-DIMENSION quantile binning (the "quantile transform"
    * feature-preprocessing step): each embedding component maps to its
    * equi-depth decile WITHIN its dimension, normalizing away
    * per-dimension scale/outliers before distance math. ntile over the
    * total order (value, vec_id) is deterministic cross-engine (both
    * engines define NTILE's remainder to front-load early buckets);
    * emitted per (dim, bucket): count and the exact float bin edges
    * cast to double (no arithmetic — bit-faithful).
    *
    * Scale shape: the per-dim window sorts within its dimension — fine
    * while a dimension's column fits a sort spill, and the gate's
    * device regardless; the at-scale form fits KLL boundaries per dim
    * (q220's sketch) and assigns buckets by range join, trading
    * exactness at the boundary for a shuffle-free map-side transform —
    * documented, the q255 discipline.
    */
  val q262QuantileBins: Q = (s, dir) => {
    import s.implicits._
    val comp = T.embeddings(s, dir)
      .select($"vec_id", posexplode($"embedding").as(Seq("dim", "v")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"dim").orderBy($"v".asc, $"vec_id".asc)
    comp.withColumn("bucket", ntile(QuantileBins).over(w))
      .groupBy($"dim", $"bucket")
      .agg(count(lit(1)).as("n"),
        min($"v").cast("double").as("lo"),
        max($"v").cast("double").as("hi"))
      .orderBy($"dim", $"bucket")
  }

  val q262Sql: String =
    s"""WITH comp AS (
       |  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings, range(1, 65) t(i)),
       |b AS (
       |  SELECT dim, v,
       |    NTILE($QuantileBins) OVER (PARTITION BY dim
       |      ORDER BY v ASC, vec_id ASC) AS bucket
       |  FROM comp)
       |SELECT dim, bucket, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
       |FROM b GROUP BY dim, bucket
       |ORDER BY dim, bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q262_quantile_bins" -> q262QuantileBins,
    "q137_group_centroid" -> q137GroupCentroid,
    "q151_embedding_covariance" -> q151EmbeddingCovariance,
    "q249_vector_audit" -> q249VectorAudit,
  )
  val oracleSql: Map[String, String] = Map(
    "q262_quantile_bins" -> q262Sql,
    "q137_group_centroid" -> q137Sql,
    "q151_embedding_covariance" -> q151Sql,
    "q249_vector_audit" -> q249Sql,
  )
}
