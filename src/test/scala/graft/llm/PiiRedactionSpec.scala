package graft.llm

import graft.SparkSpec

/** Contracts for q213: the scan must stay map-only (no exchange before
  * the final sort — regex scrubbing is embarrassingly parallel), and
  * recall/precision on the planted slice must be exact.
  */
class PiiRedactionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("redaction is map-only: no exchange below the final sort") {
    val df = PiiRedaction.q213PiiRedaction(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(physical).length
    // exactly the one range-partitioning exchange the global orderBy needs
    assert(exchanges <= 1, s"unexpected shuffles in a map-only scrub:\n$physical")
  }

  test("planted slice fully detected, clean slice has zero false positives") {
    import spark.implicits._
    val rows = PiiRedaction.q213PiiRedaction(spark, dir).collect()
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    val planted = (0L until nDocs).count(_ % 7 == 0)
    assert(rows.length == planted, s"expected $planted flagged docs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(0) % 7 == 0, s"false positive on doc ${r.getLong(0)}")
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L)),
        s"doc ${r.getLong(0)}: expected exactly one hit per type, got $r")
      val red = r.getString(4)
      assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<PHONE>"))
      assert(!red.contains("@example.com") && !red.contains("555-"))
    }
  }
}
