package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.b): image/audio/video as
  * opaque `binary` columns with typed metadata, processed batch-wise per
  * partition.
  *
  * Two REAL codecs ship, both pure-JVM: binary PPM (P6) images
  * ([[decodePpm]] — header parse, raw RGB plane walk, per-channel mean
  * features) and RIFF/WAVE 16-bit PCM audio ([[decodeWav]] — chunk
  * walk, duration + RMS features). Every other mime falls back to
  * `decodeStub` (no image/audio libraries exist in this environment),
  * behind the same seam: the schema contract, the mapPartitions batch shape (decoder
  * state initialized once per partition, exactly how a JNI codec or an
  * Arrow-batched Python UDF would be driven), and the metadata/feature
  * projection are identical for both, so swapping the stub for more
  * codecs changes no plan shape.
  *
  * Scale notes: blobs stay columnar in parquet (binary), decode is
  * narrow (no shuffle), and feature extraction emits fixed-width vectors
  * — the downstream similarity ops ([[VectorSearch]]) take over from
  * there.
  */
object Multimodal {

  val PpmMime = "image/x-portable-pixmap"

  case class MediaRecord(media_id: Long, mime: String, bytes: Array[Byte])
  case class DecodedMedia(media_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** Parsed P6 header: dims, maxval, and the raster byte offset. */
  private[llm] case class PpmHeader(width: Int, height: Int, maxval: Int,
      rasterOff: Int)

  private[llm] def parsePpmHeader(bytes: Array[Byte]): PpmHeader = {
    var pos = 0
    def skipSpace(): Unit = {
      var done = false
      while (!done && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else done = true
      }
    }
    def token(): String = {
      skipSpace()
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      new String(bytes, start, pos - start, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM payload")
    val width = token().toInt
    val height = token().toInt
    val maxval = token().toInt
    require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
    pos += 1 // single whitespace after maxval, then raster
    // long arithmetic: a malicious header like 100000x100000 must fail
    // the bounds check, not overflow int and "pass"
    require(width > 0 && height > 0, s"bad PPM dims ${width}x$height")
    require(width.toLong * height * 3 <= bytes.length.toLong - pos,
      "truncated PPM raster")
    PpmHeader(width, height, maxval, pos)
  }

  /** Real decoder for binary PPM (P6): `P6 <w> <h> <maxval>` header in
    * ASCII with whitespace/comment separators, then w·h packed RGB
    * triplets. Features = per-channel means scaled to [0,1] — the
    * hand-computable contract MultimodalSpec pins down.
    */
  private[llm] def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = parsePpmHeader(bytes)
    val n = h.width * h.height
    val sums = new Array[Long](3)
    var i = 0
    while (i < n * 3) {
      sums(i % 3) += bytes(h.rasterOff + i) & 0xFF
      i += 1
    }
    val features = Array.tabulate(3)(c =>
      (sums(c).toDouble / n / h.maxval).toFloat)
    (h.width, h.height, features)
  }

  /** Nearest-neighbor resize of a P6 raster to (tw × th): source pixel
    * (⌊tx·w/tw⌋, ⌊ty·h/th⌋) per target pixel, emitted as row-major RGB
    * floats in [0,1] — the thumbnail/patch-embedding prep step of an
    * image pipeline, as real pixel math behind the same seam as decode.
    */
  private[llm] def resizePpm(bytes: Array[Byte], tw: Int, th: Int): Array[Float] = {
    require(tw > 0 && th > 0, s"bad target dims ${tw}x$th")
    val h = parsePpmHeader(bytes)
    val out = new Array[Float](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val sy = ty.toLong * h.height / th
      var tx = 0
      while (tx < tw) {
        val sx = tx.toLong * h.width / tw
        val src = h.rasterOff + ((sy * h.width + sx) * 3).toInt
        val dst = (ty * tw + tx) * 3
        var c = 0
        while (c < 3) {
          out(dst + c) = ((bytes(src + c) & 0xFF).toFloat / h.maxval)
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    out
  }

  val WavMime = "audio/x-wav"

  /** Parsed RIFF/WAVE header: PCM format fields + data chunk bounds. */
  private[llm] case class WavHeader(channels: Int, sampleRate: Int,
      dataOff: Int, dataLen: Int)

  private[llm] def parseWavHeader(bytes: Array[Byte]): WavHeader = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44, "truncated WAV payload")
    require(buf.getInt(0) == 0x46464952, "not a RIFF payload") // "RIFF"
    require(buf.getInt(8) == 0x45564157, "not a WAVE payload") // "WAVE"
    var pos = 12
    var channels = 0
    var sampleRate = 0
    var bitsPerSample = 0
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= bytes.length && (dataOff < 0 || channels == 0)) {
      val id = buf.getInt(pos)
      val size = buf.getInt(pos + 4)
      // a corrupt negative/oversized chunk size must fail loudly, not
      // stall or walk backwards inside an executor task
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"corrupt WAV chunk size $size at offset $pos")
      if (id == 0x20746D66) { // "fmt "
        require(size >= 16, s"short fmt chunk ($size bytes)")
        require(buf.getShort(pos + 8) == 1, "only PCM WAV supported")
        channels = buf.getShort(pos + 10)
        sampleRate = buf.getInt(pos + 12)
        bitsPerSample = buf.getShort(pos + 22)
      } else if (id == 0x61746164) { // "data"
        dataOff = pos + 8
        dataLen = size
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(channels > 0 && sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0 && dataOff + dataLen <= bytes.length,
      "missing or truncated data chunk")
    require(bitsPerSample == 16, s"only 16-bit PCM supported, got $bitsPerSample")
    WavHeader(channels, sampleRate, dataOff, dataLen)
  }

  /** Real decoder for RIFF/WAVE with 16-bit PCM: walks the chunk list
    * (fmt → channels/sample-rate, data → samples) with little-endian
    * reads. Output mapping into the shared media schema: width =
    * sample rate, height = channel count, features = [duration_sec,
    * rms] with rms over [-1,1]-normalized samples.
    */
  private[llm] def decodeWav(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = parseWavHeader(bytes)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = h.dataLen / 2
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val s = buf.getShort(h.dataOff + i * 2) / 32768.0
      sumSq += s * s
      i += 1
    }
    val durationSec = n.toDouble / h.channels / h.sampleRate
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
    (h.sampleRate, h.channels, Array(durationSec.toFloat, rms.toFloat))
  }

  /** Frame-sampled RMS over a 16-bit PCM WAV: samples split into frames
    * of `frameSamples`, RMS per frame over [-1,1]-normalized values
    * (short final frame included), at most `maxFrames` frames — the
    * fixed-budget temporal summarization an audio/video pipeline runs
    * per clip (the video analog samples frames the same way).
    */
  private[llm] def frameRmsWav(bytes: Array[Byte], frameSamples: Int,
      maxFrames: Int = 64): Array[Float] = {
    require(frameSamples > 0, s"bad frame size $frameSamples")
    val h = parseWavHeader(bytes)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = h.dataLen / 2
    val nFrames = math.min(maxFrames, (n + frameSamples - 1) / frameSamples)
    val out = new Array[Float](nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * frameSamples
      val end = math.min(n, start + frameSamples)
      var sumSq = 0.0
      var i = start
      while (i < end) {
        val s = buf.getShort(h.dataOff + i * 2) / 32768.0
        sumSq += s * s
        i += 1
      }
      out(f) = math.sqrt(sumSq / (end - start)).toFloat
      f += 1
    }
    out
  }

  val GvidMime = "video/x-gvid"

  /** Parsed GVID container: byte ranges of each frame payload.
    *
    * GVID is this library's toy video container — a stand-in for a real
    * demuxer (no video codecs exist in this environment) that still
    * exercises every real seam: magic check, declared-length chunk walk
    * with the same hostile-input bounds discipline as the WAV parser,
    * and per-frame payloads decoded by the REAL image decoder
    * ([[decodePpm]]). Layout: ASCII "GVID", uint32-LE frame count, then
    * per frame uint32-LE payload length + a binary PPM (P6) payload.
    */
  private[llm] def parseGvid(bytes: Array[Byte]): IndexedSeq[(Int, Int)] = {
    require(bytes.length >= 8 &&
      new String(bytes, 0, 4, "US-ASCII") == "GVID", "not a GVID payload")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(4)
    require(n >= 0 && n <= (bytes.length - 8) / 4,
      s"implausible frame count $n")
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var pos = 8
    var i = 0
    while (i < n) {
      require(pos + 4 <= bytes.length, s"truncated frame header $i")
      val len = buf.getInt(pos)
      // declared sizes are hostile input: negative or past-the-end
      // lengths must fail loudly, not walk backwards (the WAV rule)
      require(len >= 0 && pos + 4 + len <= bytes.length,
        s"frame $i declares $len bytes past the payload end")
      out += ((pos + 4, len))
      pos += 4 + len
      i += 1
    }
    out.result()
  }

  /** Stride-sample a GVID clip: decode every `stride`-th frame (at most
    * `maxFrames` — the fixed decode budget per clip, however long the
    * video), returning (total frames, sampled indices, per-sampled-frame
    * RGB channel means flattened row-major). The temporal twin of
    * [[frameRmsWav]], with real pixel math per sampled frame.
    */
  private[llm] def sampleGvid(bytes: Array[Byte], stride: Int,
      maxFrames: Int = 16): (Int, Array[Int], Array[Float]) = {
    require(stride > 0, s"bad stride $stride")
    val frames = parseGvid(bytes)
    val idx = frames.indices.by(stride).take(maxFrames).toArray
    val means = new Array[Float](idx.length * 3)
    var i = 0
    while (i < idx.length) {
      val (off, len) = frames(idx(i))
      val (_, _, f) = decodePpm(java.util.Arrays.copyOfRange(bytes, off, off + len))
      System.arraycopy(f, 0, means, i * 3, 3)
      i += 1
    }
    (frames.length, idx, means)
  }

  /** Deterministic fake decode for mimes without a shipped codec:
    * dimensions and features derived from the payload hash. The
    * signature (bytes → dims + feature vector) is the real contract.
    */
  private[llm] def decodeStub(mime: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 16 + math.abs(h % 1024)
    val height = 16 + math.abs((h / 1024) % 1024)
    val features = Array.tabulate(8)(i =>
      ((h >>> (i * 4)) & 0xF).toFloat / 15.0f)
    (width, height, features)
  }

  private def decodeOne(mime: String, bytes: Array[Byte]): (Int, Int, Array[Float]) =
    mime match {
      case PpmMime => decodePpm(bytes)
      case WavMime => decodeWav(bytes)
      case GvidMime =>
        val frames = parseGvid(bytes)
        require(frames.nonEmpty, "empty GVID clip")
        val (off0, len0) = frames(0)
        val (w, h, _) =
          decodePpm(java.util.Arrays.copyOfRange(bytes, off0, off0 + len0))
        val (_, idx, means) = sampleGvid(bytes, stride = 1)
        val features = Array.tabulate(3) { c =>
          var acc = 0.0; var i = 0
          while (i < idx.length) { acc += means(i * 3 + c); i += 1 }
          (acc / idx.length).toFloat
        }
        (w, h, features)
      case _ => decodeStub(mime, bytes)
    }

  /** Decode a media dataset batch-wise. mapPartitions (not map) so a
    * real decoder's expensive init happens once per partition.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { m =>
        val (w, h, feats) = decodeOne(m.mime, m.bytes)
        DecodedMedia(m.media_id, m.mime, m.bytes.length, w, h, feats)
      }
    }
  }

  case class MediaThumb(media_id: Long, thumb_w: Int, thumb_h: Int,
      pixels: Array[Float])
  case class MediaFrameRms(media_id: Long, frame_rms: Array[Float])

  /** Resize every PPM payload to a (tw × th) thumbnail — row-major RGB
    * floats, the patch tensor an image-embedding stage consumes. Same
    * mapPartitions seam as [[decode]]; non-PPM rows are filtered (a
    * production pipeline routes per-mime upstream).
    */
  def resizeThumbnails(media: Dataset[MediaRecord], tw: Int,
      th: Int): Dataset[MediaThumb] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.filter(_.mime == PpmMime)
      .map(m => MediaThumb(m.media_id, tw, th, resizePpm(m.bytes, tw, th))))
  }

  /** Frame-sample every WAV payload into per-frame RMS energies (≤
    * maxFrames) — the fixed-budget temporal summary of a clip.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSamples: Int,
      maxFrames: Int = 64): Dataset[MediaFrameRms] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.filter(_.mime == WavMime)
      .map(m => MediaFrameRms(m.media_id,
        frameRmsWav(m.bytes, frameSamples, maxFrames))))
  }

  case class VideoSample(media_id: Long, n_frames: Int,
      sampled_idx: Array[Int], frame_means: Array[Float])

  /** Stride-sample every GVID payload into per-sampled-frame channel
    * means — the video leg of the multimodal seam ([[resizeThumbnails]]
    * is the image leg, [[sampleFrames]] the audio leg). Same
    * mapPartitions batch shape; the per-frame decode budget
    * (`maxFrames`) bounds work per clip regardless of clip length.
    */
  def sampleVideoFrames(media: Dataset[MediaRecord], stride: Int,
      maxFrames: Int = 16): Dataset[VideoSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.filter(_.mime == GvidMime)
      .map { m =>
        val (n, idx, means) = sampleGvid(m.bytes, stride, maxFrames)
        VideoSample(m.media_id, n, idx, means)
      })
  }

  case class VideoCuts(media_id: Long, n_frames: Int, n_cuts: Int)

  /** Scene-cut count for one GVID clip: decode consecutive frames
    * (budgeted by `maxFrames`), flag a CUT where the L1 distance
    * between consecutive frames' RGB channel means exceeds `tau` —
    * the classic histogram/intensity-difference shot-boundary
    * detector in its channel-mean form (Boreczky & Rowe 1996). The
    * distance accumulates float means in DOUBLE in channel order, so
    * the expectation mirror can replay it bit-for-bit.
    */
  private[llm] def sceneCutsGvid(bytes: Array[Byte], tau: Double,
      maxFrames: Int = 64): (Int, Int) = {
    val frames = parseGvid(bytes)
    var cuts = 0
    var prev: Array[Float] = null
    frames.take(maxFrames).foreach { case (off, len) =>
      val (_, _, f) =
        decodePpm(java.util.Arrays.copyOfRange(bytes, off, off + len))
      if (prev != null) {
        val d = math.abs(f(0).toDouble - prev(0).toDouble) +
          math.abs(f(1).toDouble - prev(1).toDouble) +
          math.abs(f(2).toDouble - prev(2).toDouble)
        if (d > tau) cuts += 1
      }
      prev = f
    }
    (frames.length, cuts)
  }

  /** Shot-boundary detection over every GVID payload — the TEMPORAL
    * analysis leg of the video seam ([[sampleVideoFrames]] summarizes
    * content, this finds structure). Same mapPartitions batch shape
    * and per-clip decode budget.
    */
  def detectSceneCuts(media: Dataset[MediaRecord], tau: Double,
      maxFrames: Int = 64): Dataset[VideoCuts] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.filter(_.mime == GvidMime)
      .map { m =>
        val (n, cuts) = sceneCutsGvid(m.bytes, tau, maxFrames)
        VideoCuts(m.media_id, n, cuts)
      })
  }

  /** Build a media table from the documents fixture (text bytes standing
    * in for encoded payloads), preserving the binary column end-to-end.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id".as("media_id"), lit("text/plain").as("mime"),
        encode($"text", "UTF-8").as("bytes"))
      .as[MediaRecord]
  }

  /** Full stub pipeline: ingest → decode → feature table. */
  def pipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decode(mediaFromDocuments(spark, sfDir))
      .select($"media_id", $"mime", $"n_bytes", $"width", $"height",
        $"features")
      .orderBy($"media_id")
  }
}

/** Rolling (polynomial) hash fingerprint — engine-internal variant used
  * for shift-tolerant chunk fingerprinting; spec-tested for determinism
  * and shift behavior.
  */
object Fingerprints {
  private val B = 1000003L
  private val M = (1L << 61) - 1

  def rollingFingerprint(tokens: Seq[String]): Long =
    tokens.foldLeft(0L)((acc, t) =>
      (acc * B + (t.hashCode.toLong & 0xFFFFFFFFL)) % M)

  /** Column form over a tokenized array, via aggregate() — stays in
    * Catalyst (no UDF).
    */
  def rollingFingerprintCol(ws: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(ws, lit(0L), (acc, t) =>
      pmod(acc * lit(B) + pmod(xxhash64(t), lit(1L << 32)), lit(M)))
}
