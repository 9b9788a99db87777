package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("binary pipeline: schema contract and deterministic stub decode") {
    val out = Multimodal.pipeline(spark, dir)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "mime", "n_bytes", "width", "height", "features"))
    val rows = out.limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(3) >= 16 && r.getInt(4) >= 16) // stub dims
      assert(r.getSeq[Float](5).length == 8)         // fixed-width features
    }
    // byte length survives the binary round-trip
    val nb = out.limit(1).collect()(0)
    assert(nb.getInt(2) > 0)
    // deterministic across runs
    val again = Multimodal.pipeline(spark, dir).limit(10).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("rolling fingerprint: deterministic, shift-sensitive") {
    val fp1 = Fingerprints.rollingFingerprint(Seq("a", "b", "c"))
    val fp2 = Fingerprints.rollingFingerprint(Seq("a", "b", "c"))
    val fp3 = Fingerprints.rollingFingerprint(Seq("b", "c", "a"))
    assert(fp1 == fp2)
    assert(fp1 != fp3)
  }
}
