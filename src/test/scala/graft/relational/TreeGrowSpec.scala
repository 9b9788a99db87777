package graft.relational

import graft.SparkSpec

/** Tree-consistency invariants at sf0.001: the root's child counts
  * are exactly the children's node sizes, every selected gain is
  * non-negative (Gini is concave — splitting never hurts; the
  * double-negation argmax bug shipped exactly one negative-gain tree
  * before the oracle caught it), and growth is deterministic.
  */
class TreeGrowSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = TreeGrow.q333TreeDepth2(spark, dir).collect()
    .map(r => r.getAs[String]("node") -> r).toMap

  test("children partition the root exactly") {
    val root = rows("root")
    val l = rows("root/L"); val r = rows("root/R")
    assert(root.getAs[Long]("n_left") == l.getAs[Long]("n_node"))
    assert(root.getAs[Long]("n_right") == r.getAs[Long]("n_node"))
    assert(l.getAs[Long]("n_node") + r.getAs[Long]("n_node")
      == root.getAs[Long]("n_node"))
  }

  test("every selected gain is non-negative") {
    rows.values.foreach { r =>
      assert(r.getAs[Double]("gain") >= -1e-12, s"negative gain: $r")
    }
  }

  test("growth is deterministic across reruns") {
    val again = TreeGrow.q333TreeDepth2(spark, dir).collect()
      .map(r => r.getAs[String]("node") -> r.toString).toMap
    assert(again == rows.map { case (k, v) => k -> v.toString })
  }
}
