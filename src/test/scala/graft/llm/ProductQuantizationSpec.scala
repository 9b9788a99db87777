package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._
  import ProductQuantization._

  // 4-dim vectors, m=2 subspaces of 2 dims; two obvious clusters per
  // subspace so k=2 codebooks are hand-predictable after normalization.
  private def fixture = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
    (1L, Array(0.9f, 0.1f, 0.1f, 0.9f)),
    (2L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
    (3L, Array(0.1f, 0.9f, 0.9f, 0.1f)),
  ).toDF("vec_id", "embedding")

  test("fitSubspace is deterministic and separates obvious clusters") {
    val sample = Array(
      Array(1.0, 0.0), Array(0.9, 0.1), Array(0.0, 1.0), Array(0.1, 0.9))
    val a = fitSubspace(sample, 2)
    val b = fitSubspace(sample, 2)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // one centroid near (0.95, 0.05), the other near (0.05, 0.95)
    val near = (c: Array[Double], x: Double, y: Double) =>
      math.abs(c(0) - x) < 0.2 && math.abs(c(1) - y) < 0.2
    assert(a.exists(near(_, 0.95, 0.05)) && a.exists(near(_, 0.05, 0.95)))
  }

  test("encode assigns same-cluster vectors the same codes, coverage total") {
    val cb = fitPq(fixture, m = 2, k = 2)
    assert(cb.size == 4) // 2 subspaces x 2 codes
    val codes = encode(fixture, cb, m = 2).orderBy($"vec_id")
      .as[(Long, Seq[Int])].collect()
    assert(codes.length == 4, "every vector encoded")
    assert(codes.forall(_._2.length == 2), "one code per subspace")
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 2)))
    val byId = codes.map { case (id, cs) => id -> cs }.toMap
    assert(byId(0L) == byId(1L), "vectors 0/1 share both cluster codes")
    assert(byId(2L) == byId(3L), "vectors 2/3 share both cluster codes")
    assert(byId(0L) != byId(2L), "opposite clusters get different codes")
  }

  test("ADC top-1 retrieves the exact vector for in-corpus queries") {
    val cb = fitPq(fixture, m = 2, k = 2)
    val codes = encode(fixture, cb, m = 2)
    val queries = fixture.select($"vec_id".as("qid"), $"embedding")
    val top1 = ProductQuantization.adcTop1(codes, queries, cb, m = 2)
      .orderBy($"qid").as[(Long, Long, Double)].collect()
    // codes collide within a cluster, so top-1 must land IN the query's
    // cluster (ties break to the smallest vec_id)
    val cluster = Map(0L -> Set(0L, 1L), 1L -> Set(0L, 1L),
      2L -> Set(2L, 3L), 3L -> Set(2L, 3L))
    top1.foreach { case (qid, vid, _) =>
      assert(cluster(qid).contains(vid), s"query $qid retrieved $vid")
    }
  }
}
