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

  test("real WAV (PCM16) decode: rate, channels, duration, rms") {
    import spark.implicits._
    // 1 channel, 8000 Hz, 4 samples at half amplitude → rms 0.5
    val buf = java.nio.ByteBuffer.allocate(52)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(44)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(8)
      .putShort(16384).putShort(16384).putShort(-16384).putShort(-16384)
    val wav = buf.array()
    val out = Multimodal.decode(
      Seq(Multimodal.MediaRecord(9L, Multimodal.WavMime, wav)).toDS())
      .collect()(0)
    assert(out.width == 8000 && out.height == 1)
    assert(out.features.length == 2)
    assert(math.abs(out.features(0) - 0.0005f) < 1e-7, "duration wrong")
    assert(math.abs(out.features(1) - 0.5f) < 1e-6, "rms wrong")
    intercept[Exception] {
      Multimodal.decode(Seq(Multimodal.MediaRecord(10L, Multimodal.WavMime,
        "nope".getBytes)).toDS()).collect()
    }
  }

  test("PPM resize: nearest-neighbor picks the expected source pixels") {
    import spark.implicits._
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array(
      255, 0, 0,   0, 255, 0,
      0, 0, 255,   255, 255, 255).map(_.toByte)
    val media = Seq(
      Multimodal.MediaRecord(1L, Multimodal.PpmMime, header ++ raster)).toDS()
    // downsample 2x2 -> 1x1: nearest neighbor is pixel (0,0) = pure red
    val one = Multimodal.resizeThumbnails(media, 1, 1).collect()(0)
    assert(one.pixels.toSeq == Seq(1.0f, 0.0f, 0.0f), s"${one.pixels.toSeq}")
    // upsample 2x2 -> 4x4: each source pixel becomes a 2x2 block; check
    // the four block corners
    val up = Multimodal.resizeThumbnails(media, 4, 4).collect()(0)
    def px(x: Int, y: Int) = up.pixels.slice((y * 4 + x) * 3, (y * 4 + x) * 3 + 3).toSeq
    assert(px(0, 0) == Seq(1.0f, 0.0f, 0.0f))  // red block
    assert(px(3, 0) == Seq(0.0f, 1.0f, 0.0f))  // green block
    assert(px(0, 3) == Seq(0.0f, 0.0f, 1.0f))  // blue block
    assert(px(3, 3) == Seq(1.0f, 1.0f, 1.0f))  // white block
  }

  test("WAV frame-sampling: per-frame rms with short final frame") {
    import spark.implicits._
    // 6 samples: two at half amplitude, two at zero, two at half
    val buf = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(48)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(12)
      .putShort(16384).putShort(-16384)
      .putShort(0).putShort(0)
      .putShort(16384).putShort(16384)
    val media = Seq(
      Multimodal.MediaRecord(2L, Multimodal.WavMime, buf.array())).toDS()
    val frames = Multimodal.sampleFrames(media, frameSamples = 2)
      .collect()(0).frame_rms.toSeq
    assert(frames.length == 3)
    assert(math.abs(frames(0) - 0.5f) < 1e-6 && frames(1) == 0.0f
      && math.abs(frames(2) - 0.5f) < 1e-6, s"$frames")
    // frame budget cap: 4-sample frames -> 2 frames; cap at 1 keeps 1
    val capped = Multimodal.sampleFrames(media, frameSamples = 4, maxFrames = 1)
      .collect()(0).frame_rms
    assert(capped.length == 1)
  }

  test("GVID video: stride sampling decodes the expected frames; " +
      "hostile lengths fail loudly") {
    import spark.implicits._
    // 1x1 frames with distinct solid colors — per-frame means are the
    // pixel values / 255
    def frame(r: Int, g: Int, b: Int): Array[Byte] =
      "P6\n1 1\n255\n".getBytes("US-ASCII") ++
        Array(r, g, b).map(_.toByte)
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def gvid(frames: Seq[Array[Byte]]): Array[Byte] =
      "GVID".getBytes("US-ASCII") ++ le32(frames.length) ++
        frames.flatMap(f => le32(f.length) ++ f)
    val colors = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255),
      (255, 255, 255), (0, 0, 0))
    val clip = gvid(colors.map { case (r, g, b) => frame(r, g, b) })
    val media = Seq(Multimodal.MediaRecord(1L, Multimodal.GvidMime, clip)).toDS()
    // stride 2 over 5 frames → indices 0, 2, 4 (red, blue, black)
    val out = Multimodal.sampleVideoFrames(media, stride = 2).collect()
    assert(out.length == 1)
    val v = out(0)
    assert(v.n_frames == 5)
    assert(v.sampled_idx.toSeq == Seq(0, 2, 4))
    assert(v.frame_means.toSeq == Seq(
      1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 1.0f, 0.0f, 0.0f, 0.0f))
    // maxFrames caps the decode budget
    val capped = Multimodal.sampleVideoFrames(media, stride = 1,
      maxFrames = 2).collect()(0)
    assert(capped.sampled_idx.toSeq == Seq(0, 1) && capped.n_frames == 5)
    // decode() routes the mime: first-frame dims + mean over all frames
    val d = Multimodal.decode(media).collect()(0)
    assert((d.width, d.height) == (1, 1))
    assert(d.features.toSeq == Seq(0.4f, 0.4f, 0.4f)) // (255+0+0+255+0)/5/255
    // a frame declaring a length past the payload end must fail loudly
    val corrupt = clip.clone()
    corrupt(8) = 0x7F.toByte; corrupt(9) = 0x7F.toByte // frame-0 len huge
    intercept[Exception] {
      Multimodal.sampleVideoFrames(
        Seq(Multimodal.MediaRecord(2L, Multimodal.GvidMime, corrupt)).toDS(),
        stride = 1).collect()
    }
    // truncated container (frame count > frames present) fails loudly
    intercept[Exception] {
      Multimodal.sampleVideoFrames(
        Seq(Multimodal.MediaRecord(3L, Multimodal.GvidMime,
          gvid(colors.take(2).map { case (r, g, b) => frame(r, g, b) })
            .dropRight(5))).toDS(),
        stride = 1).collect()
    }
  }

  test("q180 generators: closed-form expectations equal the real decoders, " +
      "and corruption is detected") {
    // the oracle gate's core identity: expected values computed from the
    // generator's closed form must match the DECODER's output on the
    // generated bytes bit-for-bit (independent paths to the same answer)
    Seq(0L, 1L, 7L, 13L, 24L).foreach { id =>
      assert(MultimodalOracle.ppmExpected(id) match {
        case (w, h, f) =>
          val (dw, dh, df) = Multimodal.decodePpm(MultimodalOracle.ppmBytes(id))
          dw == w && dh == h && df.sameElements(f)
      }, s"ppm mismatch for id=$id")
      assert(MultimodalOracle.wavExpected(id) match {
        case (w, h, f) =>
          val (dw, dh, df) = Multimodal.decodeWav(MultimodalOracle.wavBytes(id))
          dw == w && dh == h && df.sameElements(f)
      }, s"wav mismatch for id=$id")
    }
    // the gate is not vacuous: one flipped raster byte changes features
    val bytes = MultimodalOracle.ppmBytes(3L)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x55).toByte
    val (_, _, corrupted) = Multimodal.decodePpm(bytes)
    assert(!corrupted.sameElements(MultimodalOracle.ppmExpected(3L)._3))
  }

  test("scene cuts: hand-built clip counts boundaries; mirror agrees on fixture ids") {
    // hand-built 3-frame clip: identical, identical, different
    def solidPpm(v: Int): Array[Byte] = {
      val header = s"P6\n2 2\n255\n".getBytes("US-ASCII")
      header ++ Array.fill(12)(v.toByte)
    }
    def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    val frames = Seq(solidPpm(10), solidPpm(10), solidPpm(200))
    val clip = "GVID".getBytes("US-ASCII") ++ le32(3) ++
      frames.flatMap(f => le32(f.length) ++ f)
    val (n, cuts) = Multimodal.sceneCutsGvid(clip, tau = 0.05)
    assert(n == 3 && cuts == 1,
      s"expected 1 cut over 2 transitions, got $cuts over ${n - 1}")
    // threshold edge: a tau above any possible L1 (max 3.0) finds none
    assert(Multimodal.sceneCutsGvid(clip, tau = 4.0)._2 == 0)
    // mirror parity on the real fixture arithmetic
    (0L until MultimodalOracle.MediaDocBound).foreach { id =>
      val (en, ec) = MultimodalOracle.cutsExpected(id)
      val (dn, dc) =
        Multimodal.sceneCutsGvid(MultimodalOracle.gvidBytes(id), MultimodalOracle.CutTau)
      assert(en == dn && ec == dc, s"cut mirror drift for id=$id")
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
