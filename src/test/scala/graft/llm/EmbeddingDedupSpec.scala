package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Tables => T}
import graft.functions.VectorFunctions._

/** Embedding near-dup pipeline (q112): the banded-SRP candidate stage
  * must be LOSSLESS at the verify threshold on the twin corpus (that is
  * the oracle contract), with a ≥2-band collision margin on every true
  * pair, and the verified answer must equal the exact all-pairs answer.
  */
class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus = EmbeddingDedup.twinCorpus(T.embeddings(spark, dir))

  /** Exact all-pairs duplicates — the ground truth the banding must
    * reproduce.
    */
  private def exactPairs = {
    val e = corpus.select($"vec_id", $"embedding",
      norm_q20($"embedding").as("norm"))
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("ea"),
      $"norm".as("na"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("eb"),
      $"norm".as("nb"))
    a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("cos_sim",
        cosine(dot_q20($"ea", $"eb").cast("double"), $"na", $"nb"))
      .filter($"cos_sim" >= EmbeddingDedup.NearDupThreshold)
      .select($"id_a", $"id_b", $"cos_sim")
  }

  test("pipeline answer equals the exact all-pairs answer (lossless at τ)") {
    val got = EmbeddingDedup
      .nearDupPairs(corpus, EmbeddingDedup.NearDupThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = exactPairs
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture produced no duplicate pairs — dead test")
    val missed = want.map(p => (p._1, p._2)) -- got.map(p => (p._1, p._2))
    assert(missed.isEmpty, s"banding missed true pairs: $missed")
    assert(got == want, "verify stage admitted a below-threshold pair " +
      s"or drifted a cosine: ${got -- want}")
  }

  test("every true pair collides in ≥ 2 bands (single-band-flip margin)") {
    val counts = EmbeddingDedup.candidateBandCounts(corpus)
    val weak = exactPairs.select($"id_a", $"id_b")
      .join(counts, Seq("id_a", "id_b"), "left")
      .filter(coalesce($"bands", lit(0L)) < 2)
      .collect()
    assert(weak.isEmpty,
      s"pairs with <2 band collisions: ${weak.mkString(", ")}")
  }

  test("semantic dedup gate: twins dropped at the floor, deterministic") {
    val row1 = EmbeddingDedup.q185SemanticDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val row2 = EmbeddingDedup.q185SemanticDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(row1 == row2, "semantic dedup gate is not deterministic")
    assert(row1.head._2, "twin recall below the SemDeDup floor")
    assert(row1.head._1 == corpus.count())
  }

  test("twin derivation zeroes exactly the first two coordinates") {
    val orig = T.embeddings(spark, dir)
      .filter($"vec_id" === 0).select($"embedding")
      .as[Array[Float]].head()
    val twin = corpus
      .filter($"vec_id" === EmbeddingDedup.TwinIdOffset)
      .select($"embedding").as[Array[Float]].head()
    assert(twin.length == orig.length)
    assert(twin(0) == 0.0f && twin(1) == 0.0f)
    assert(twin.drop(2).sameElements(orig.drop(2)))
  }
}
