package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("lsh bucketing is deterministic and total") {
    val a = VectorSearch.q45LshAnn(spark, dir)
      .select("qid", "bucket").as[(Long, Long)].collect().toSeq
    val b = VectorSearch.q45LshAnn(spark, dir)
      .select("qid", "bucket").as[(Long, Long)].collect().toSeq
    assert(a == b, "bucket assignment not deterministic")
    assert(a.forall { case (_, bk) => bk >= 0 && bk < 256 })
  }

  test("identical vectors land in the same bucket (recall floor)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(5)
    val dup = e.withColumn("vec_id", $"vec_id" + 100000L)
    val both = e.unionByName(dup)
    both.createOrReplaceTempView("planted_emb")
    // run the same bucketing expression over the planted frame
    val planes = VectorSearch.planeMatrix(64)
    val bucketCol = (0 until VectorSearch.LshPlanes).map { p =>
      val proj = (0 until 64).map(i =>
        element_at($"embedding", i + 1).cast("double") * lit(planes(p)(i)))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val buckets = both.select($"vec_id", bucketCol.as("bucket"))
      .as[(Long, Long)].collect().toMap
    (0 until 5).foreach { _ => }
    buckets.keys.filter(_ < 100000L).foreach { id =>
      assert(buckets(id) == buckets(id + 100000L),
        s"duplicate of $id hashed to a different bucket")
    }
  }

  test("brute-force topk: self-similarity excluded, ranks contiguous") {
    val rows = VectorSearch.q44CosineTopk(spark, dir)
      .select("qid", "rank", "nid", "cos_sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, _, n, _) => q != n })
    val byQ = rows.groupBy(_._1)
    assert(byQ.values.forall(_.map(_._2).sorted.toSeq == Seq(1, 2, 3)))
    // scores non-increasing within a query
    assert(byQ.values.forall { rs =>
      val s = rs.sortBy(_._2).map(_._4)
      s.zip(s.tail).forall { case (x, y) => x >= y }
    })
  }
}
