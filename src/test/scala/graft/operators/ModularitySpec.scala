package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed Newman modularity on toy graphs: two disjoint
  * triangles under the natural 2-community labeling score Q = ¼ + ¼
  * = ½ (the textbook two-clique value), and the all-one-community
  * labeling of ANY graph scores exactly 0 (e/2m = 1 and (d/2m)² = 1
  * telescope) — the null-model sanity identity.
  */
class ModularitySpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")

  private val twoTriangles = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L),
    (10L, 11L), (10L, 12L), (11L, 12L))

  test("two disjoint triangles: each community contributes 1/4") {
    val edges = sym(twoTriangles).localCheckpoint()
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L)).toDF("node", "label")
    val rows = LabelPropagation.modularityOf(edges, labels)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 2)
    rows.foreach { case (_, n, d, e, q) =>
      assert(n == 3L && d == 6L && e == 6L)
      assert(q == 0.25, s"expected 1/4, got $q")
    }
  }

  test("single-community labeling scores exactly zero") {
    val edges = sym(twoTriangles ++ Seq((3L, 10L))).localCheckpoint()
    val labels = edges.select($"u".as("node")).distinct()
      .withColumn("label", lit(1L))
    val rows = LabelPropagation.modularityOf(edges, labels)
      .select(sum($"q_contrib")).as[Double].head()
    assert(rows == 0.0, s"one community must score Q=0, got $rows")
  }

  test("LPA labels on bridged triangles score higher than one blob") {
    val edges = sym(twoTriangles ++ Seq((3L, 10L))).localCheckpoint()
    val lpa = LabelPropagation.propagate(edges)
    val qLpa = LabelPropagation.modularityOf(edges, lpa)
      .select(sum($"q_contrib")).as[Double].head()
    assert(qLpa > 0.3, s"two-community split should approach 1/2: $qLpa")
  }
}
