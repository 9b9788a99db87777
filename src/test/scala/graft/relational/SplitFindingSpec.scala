package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of histogram split finding at sf0.001: every
  * feature's children partition the full row count, positives never
  * exceed counts, gains sit in the Gini-possible band (0, 0.5], and
  * the discount split beats the tax split (discount correlates with
  * returnflag in no way tax doesn't — both random; so instead pin the
  * strongest-feature gain ordering is deterministic across refits).
  */
class SplitFindingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = SplitFinding.q330SplitFinding(spark, dir)
    .collect()

  test("one best split per feature; children partition the data") {
    val n = graft.core.Tables.lineitem(spark, dir).count()
    assert(rows.length == 4, s"expected 4 features: ${rows.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == n,
        s"children must partition all $n rows: $r")
      assert(r.getAs[Long]("pos_left") <= r.getAs[Long]("n_left"))
      assert(r.getAs[Long]("pos_right") <= r.getAs[Long]("n_right"))
      assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
    }
  }

  test("gains live in the Gini band and refits are identical") {
    rows.foreach { r =>
      val g = r.getAs[Double]("gain")
      assert(g >= 0.0 && g <= 0.5, s"gain out of band: $r")
    }
    val again = SplitFinding.q330SplitFinding(spark, dir).collect()
    assert(rows.toSeq == again.toSeq, "split finding not deterministic")
  }

  test("bin ids stay inside [0, SplitBins)") {
    rows.foreach { r =>
      val b = r.getAs[Long]("split_bin")
      assert(b >= 0 && b < SplitFinding.SplitBins, s"bin out of range: $r")
    }
  }
}
