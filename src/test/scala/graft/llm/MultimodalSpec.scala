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

  test("real PPM (P6) decode: dims and channel means from raw bytes") {
    import spark.implicits._
    // 2x2 image: red, green, blue, white — hand-computable channel means
    val header = "P6\n# test\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array(
      255, 0, 0,   0, 255, 0,
      0, 0, 255,   255, 255, 255).map(_.toByte)
    val ppm = header ++ raster
    val media = Seq(Multimodal.MediaRecord(7L, Multimodal.PpmMime, ppm)).toDS()
    val out = Multimodal.decode(media).collect()
    assert(out.length == 1)
    val d = out(0)
    assert((d.width, d.height) == (2, 2))
    assert(d.n_bytes == ppm.length)
    // mean of each channel over {red, green, blue, white}: 510/4/255 = 0.5
    assert(d.features.toSeq == Seq(0.5f, 0.5f, 0.5f))
    // malformed payloads fail loudly, not silently
    intercept[Exception] {
      Multimodal.decode(
        Seq(Multimodal.MediaRecord(8L, Multimodal.PpmMime,
          "P3\n2 2\n255\n".getBytes("US-ASCII"))).toDS()).collect()
    }
  }

  test("rolling fingerprint: deterministic, shift-sensitive") {
    val fp1 = Fingerprints.rollingFingerprint(Seq("a", "b", "c"))
    val fp2 = Fingerprints.rollingFingerprint(Seq("a", "b", "c"))
    val fp3 = Fingerprints.rollingFingerprint(Seq("b", "c", "a"))
    assert(fp1 == fp2)
    assert(fp1 != fp3)
  }
}
