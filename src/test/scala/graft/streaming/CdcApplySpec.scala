package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class CdcRow(k: Long, v: String, seq: Long)

/** Streaming CDC apply: cross-batch upsert semantics, within-batch
  * last-writer-wins by sequence, atomic pointer publish, and snapshot
  * history retention (time travel to the pre-batch state).
  */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  test("cdc stream folds into published snapshots with lww semantics") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("cdc-apply").toString
    val ckpt = Files.createTempDirectory("cdc-ckpt").toString
    val stream = MemoryStream[CdcRow]
    val q = CdcApply.start(stream.toDF(), root, Seq("k"), "seq", ckpt)
    // batch 0: includes a within-batch duplicate of key 1 — the higher
    // seq must win regardless of arrival order
    stream.addData(CdcRow(1, "a", 1), CdcRow(2, "b", 1), CdcRow(1, "a2", 2))
    q.processAllAvailable()
    val after0 = spark.read.parquet(s"$root/snapshots/b00000000")
      .as[CdcRow].collect().map(r => r.k -> (r.v, r.seq)).toMap
    assert(after0 == Map(1L -> ("a2", 2L), 2L -> ("b", 1L)),
      s"batch-0 state wrong: $after0")
    // batch 1: replace key 2, insert key 3
    stream.addData(CdcRow(2, "b2", 3), CdcRow(3, "c", 3))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val active = Files.readString(Paths.get(root, "ACTIVE")).trim
    assert(active == "b00000001", s"ACTIVE points at $active")
    val finalState = CdcApply
      .activeState(spark, root, stream.toDF().schema)
      .as[CdcRow].collect().map(r => r.k -> (r.v, r.seq)).toMap
    assert(finalState == Map(
      1L -> ("a2", 2L), 2L -> ("b2", 3L), 3L -> ("c", 3L)),
      s"final state wrong: $finalState")
    // history retained: the pre-batch-1 snapshot is still readable
    assert(Files.exists(Paths.get(s"$root/snapshots/b00000000")),
      "prior snapshot was deleted — no time travel")
  }
}
