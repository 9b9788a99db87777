package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.b
  * north-star ops).
  *
  * Two paths, as a production pipeline would ship them:
  *   - [[q44CosineTopk]] — exact brute-force top-k: broadcast one side,
  *     fused codegen dot product ([[graft.functions.DotProductF32]]),
  *     per-query heap via row_number. O(N·M·d) but embarrassingly
  *     parallel; right-sized when one side fits in a broadcast (the
  *     query set). This is the form whose results are oracle-checked.
  *   - [[q45LshAnn]] — approximate scale path: sign-random-projection
  *     LSH buckets. At 100 TB the brute-force cross join is infeasible
  *     (N² pairs); bucketing turns it into an equi-join on bucket id —
  *     one shuffle, candidates only within buckets, recall tunable by
  *     #planes/#tables. Hash planes are seeded constants so the
  *     bucketing is deterministic across runs and executors.
  */
object VectorSearch {

  type Q = (SparkSession, String) => DataFrame

  /** Exact top-3 cosine neighbors for every vector, on the quantized
    * (2^20) dot — engine-order-independent int64 accumulation (see
    * [[graft.functions.DotProductQ20]]), so scores AND rankings are
    * reproducible anywhere. Norms are computed once per side (not per
    * pair); the pair join broadcasts the deduplicated (id, vec, norm)
    * projection.
    */
  val q44CosineTopk: Q = (s, dir) => {
    import s.implicits._
    val e = T.embeddings(s, dir)
      .select($"vec_id", $"embedding", norm_q20($"embedding").as("norm"))
    val a = e.select($"vec_id".as("qid"), $"embedding".as("ea"),
      $"norm".as("na"))
    val b = e.select($"vec_id".as("nid"), $"embedding".as("eb"),
      $"norm".as("nb"))
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"nid".asc)
    a.join(broadcast(b), $"qid" =!= $"nid")
      .withColumn("cos_sim",
        cosine(dot_q20($"ea", $"eb").cast("double"), $"na", $"nb"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"qid", $"rank", $"nid", $"cos_sim")
      .orderBy($"qid", $"rank")
  }

  val q44Sql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |norms AS (
      |  SELECT vec_id, SQRT(CAST(SUM(qv[i] * qv[i]) AS DOUBLE)) AS nrm
      |  FROM q, range(1, 65) t(i) GROUP BY vec_id),
      |dots AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS nid,
      |    CAST(SUM(a.qv[i] * b.qv[i]) AS DOUBLE) AS dot
      |  FROM q a JOIN q b ON a.vec_id <> b.vec_id,
      |       range(1, 65) t(i)
      |  GROUP BY 1, 2),
      |cos AS (
      |  SELECT qid, nid, dot / (na.nrm * nb.nrm) AS cos_sim
      |  FROM dots JOIN norms na ON dots.qid = na.vec_id
      |            JOIN norms nb ON dots.nid = nb.vec_id),
      |ranked AS (
      |  SELECT qid, nid, cos_sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid ASC) AS rank
      |  FROM cos)
      |SELECT qid, rank, nid, cos_sim FROM ranked WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin

  /** Number of hyperplanes per LSH signature (bucket space = 2^planes). */
  val LshPlanes = 8
  private val LshSeed = 42

  /** Deterministic ±1 hyperplane components, seeded — identical on every
    * executor without any broadcast of state.
    */
  private[llm] def planeMatrix(dim: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(LshSeed)
    Array.fill(LshPlanes, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign-random-projection bucket per vector + top-1 neighbor within
    * the bucket. The bucket assignment is a literal-array dot product —
    * pure Catalyst expressions, no UDF, no driver loop.
    */
  val q45LshAnn: Q = (s, dir) => {
    import s.implicits._
    val dim = 64
    val planes = planeMatrix(dim)
    // bucket = Σ_p (sign(v·plane_p) << p), built from expressions
    val bucketCol = (0 until LshPlanes).map { p =>
      val proj = (0 until dim).map(i =>
        element_at($"embedding", i + 1).cast("double") * lit(planes(p)(i)))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

    val bucketed = T.embeddings(s, dir)
      .select($"vec_id", $"embedding",
        norm_f32($"embedding").as("norm"), bucketCol.as("bucket"))
    val a = bucketed.select($"bucket", $"vec_id".as("qid"),
      $"embedding".as("ea"), $"norm".as("na"))
    val b = bucketed.select($"bucket", $"vec_id".as("nid"),
      $"embedding".as("eb"), $"norm".as("nb"))
    val w = Window.partitionBy($"qid").orderBy($"cos_sim".desc, $"nid".asc)
    a.join(b, Seq("bucket"))
      .filter($"qid" =!= $"nid")
      .withColumn("cos_sim", cosine(dot_f32($"ea", $"eb"), $"na", $"nb"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" === 1)
      .select($"qid", $"bucket", $"nid", $"cos_sim")
      .orderBy($"qid")
  }

  val queries: Map[String, Q] = Map(
    "q44_cosine_topk" -> q44CosineTopk,
    "q45_lsh_ann" -> q45LshAnn,
  )

  /** q45 has no oracle: the bucket assignment is engine-internal (seeded
    * planes); correctness is property-tested in VectorSearchSpec
    * (determinism, planted-duplicate recall) instead.
    */
  val oracleSql: Map[String, String] = Map(
    "q44_cosine_topk" -> q44Sql,
  )
}
