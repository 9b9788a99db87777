package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Tables => T}

/** Structural no-leakage invariant for q141: no near-dup pair may
  * straddle two splits — the property the cluster-granular split
  * exists to guarantee (a plain per-doc split violates it whenever a
  * near-dup pair hashes to different buckets).
  */
class ClusterSplitSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("no near-duplicate pair straddles two splits") {
    val docs = T.documents(spark, sfDir)
    val pairs = DedupQueries
      .nearDuplicates(spark, docs, DedupQueries.NearDupThreshold)
      .select($"doc1", $"doc2")
    assert(pairs.count() > 0, "fixture must contain near-dup pairs")
    val cc = graft.operators.ConnectedComponents(pairs, "doc1", "doc2")
    val reps = docs.select($"doc_id")
      .join(cc.select($"id".as("doc_id"), $"comp"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"comp", $"doc_id").as("cluster_rep"))
    val split = TextPipeline.trainSplit(reps, idCol = "cluster_rep")
      .select($"doc_id", $"split")
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "doc1")
        .withColumnRenamed("split", "s1"), "doc1")
      .join(split.withColumnRenamed("doc_id", "doc2")
        .withColumnRenamed("split", "s2"), "doc2")
      .filter($"s1" =!= $"s2")
      .count()
    assert(straddling == 0L, s"$straddling near-dup pairs cross splits")
    // and the naive per-doc split WOULD leak on this fixture, so the
    // invariant above is not vacuous
    val naive = TextPipeline.trainSplit(docs.select($"doc_id"))
      .select($"doc_id", $"split")
    val naiveStraddle = pairs
      .join(naive.withColumnRenamed("doc_id", "doc1")
        .withColumnRenamed("split", "s1"), "doc1")
      .join(naive.withColumnRenamed("doc_id", "doc2")
        .withColumnRenamed("split", "s2"), "doc2")
      .filter($"s1" =!= $"s2")
      .count()
    assert(naiveStraddle > 0L,
      "fixture should demonstrate naive-split leakage")
  }

  test("schema-evolution read surfaces the added column as null on old rows") {
    val out = graft.sources.SchemaEvolution
      .q144SchemaEvolution(spark, sfDir).collect()
    assert(out.length == 25)
    assert(out.filter(_.getInt(0) < 13).forall(_.isNullAt(2)),
      "batch1 rows must have null region")
    assert(out.filter(_.getInt(0) >= 13).forall(!_.isNullAt(2)),
      "batch2 rows must carry region")
  }
}
