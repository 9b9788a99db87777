package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-verifiable multinomial NB behavior on toy corpora plus the
  * planted-concept gate end-to-end at sf0.001.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("argmax follows the class whose tokens dominate the test doc") {
    val train = docs(
      (1L, "A", "x x y"), (2L, "A", "x y y"),
      (3L, "B", "z z y"), (4L, "B", "z y y"))
    val test = docs((10L, "A", "x x"), (11L, "B", "z z z"))
    val out = NaiveBayes.predictFrom(train, test)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out(10L) == "A", s"x-heavy doc must go to A: $out")
    assert(out(11L) == "B", s"z-heavy doc must go to B: $out")
  }

  test("Laplace smoothing: unseen tokens do not veto the majority class") {
    val train = docs(
      (1L, "A", "x x x x"), (2L, "B", "z z z z"))
    // 'q' unseen anywhere; 'x' seen only in A — A must still win.
    val test = docs((10L, "A", "x q"))
    val out = NaiveBayes.predictFrom(train, test)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out(10L) == "A", s"unseen token broke smoothing: $out")
  }

  test("prior dominates an uninformative doc; ties break to smaller class") {
    // 3 A-docs vs 1 B-doc, shared vocabulary: empty-ish evidence goes A.
    val train = docs(
      (1L, "A", "y"), (2L, "A", "y"), (3L, "A", "y"), (4L, "B", "y"))
    val out = NaiveBayes.predictFrom(train, docs((10L, "?", "y")))
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out(10L) == "A", s"prior 3:1 must win: $out")
  }

  test("deterministic across refits") {
    val train = docs(
      (1L, "A", "x x y"), (2L, "B", "z z y"), (3L, "A", "x"), (4L, "B", "z"))
    val test = docs((10L, "?", "x z y"), (11L, "?", "z y"))
    val a = NaiveBayes.predictFrom(train, test).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val b = NaiveBayes.predictFrom(train, test).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(a == b)
  }

  test("planted-concept gate is green at sf0.001") {
    val row = NaiveBayes.q319NaiveBayes(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getAs[Boolean]("ok"),
      s"gate failed: $row (acc below ${NaiveBayes.MinAccPermille}permille?)")
    assert(row.getAs[Long]("n_classes") == 2L)
  }
}
