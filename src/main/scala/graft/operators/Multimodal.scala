package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): treat media payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as a batched per-partition pass.
  *
  * The Spark-side architecture — schema (id, content: binary, meta
  * struct), partition-parallel batched processing via `mapPartitions`
  * on a typed Dataset (the JVM analogue of `mapInPandas`: one iterator
  * per partition, amortized setup, no per-row UDF dispatch), and a
  * columnar-friendly output schema — pairs with REAL decode paths for
  * all three modalities, each JDK-built-in with zero extra
  * dependencies: images ([[ImageCodec]], `javax.imageio`: PNG/BMP/GIF/
  * JPEG), audio ([[AudioCodec]], `javax.sound.sampled`: WAV/AIFF/AU
  * PCM), and video ([[VideoCodec]]: RIFF/AVI container walk — the WAV
  * container's family — with MJPEG frames decoded per-frame through
  * `javax.imageio` and uncompressed BI_RGB DIB frames read directly).
  */
object Multimodal {

  /** One media record: payload bytes + metadata a catalog would carry. */
  case class MediaRecord(id: Long, content: Array[Byte], format: String, nBytes: Long)

  /** Wrap a text fixture as a binary media table (stand-in for real
    * image/audio payloads; schema and partitioning are what matter).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      lit("text/plain").as("format"),
      octet_length(col(payloadCol)).cast("long").as("nBytes"))

  /** Real-world ingest path: read raw media files from a directory via
    * Spark's built-in `binaryFile` source (one row per file: path,
    * modificationTime, length, content) into the same media schema the
    * decode pipeline consumes. `pathGlob` filters (e.g.
    * `*.jpg`); ids are derived from the file name's digits (falling
    * back to a path hash), the format from the extension. The
    * binaryFile source is scan-parallel per file and prunes on the
    * (path, length) metadata columns without reading payloads.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      pathGlob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)
      .select(
        coalesce(
          regexp_extract(col("path"), "(\\d+)[^/]*$", 1).cast("long"),
          xxhash64(col("path"))).as("id"),
        col("content"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("format"),
        col("length").as("nBytes"))

  /** Decoded image statistics; all-null stats mark an undecodable
    * payload (corrupt bytes must surface as an auditable null row, not
    * kill the job or silently vanish).
    */
  case class ImageStats(doc_id: Long, width: Option[Long], height: Option[Long],
      n_channels: Option[Long], sum_r: Option[Long], sum_g: Option[Long],
      sum_b: Option[Long])

  /** REAL image codec — `javax.imageio` ships in the JDK (PNG/BMP/GIF/
    * JPEG), so the decode step needs no external dependency. Encoding
    * exists to plant deterministic fixtures; decoding is the production
    * path. Channel sums are read through `getRGB` (canonical packed
    * ARGB) so the result is independent of the reader's internal raster
    * layout, and PNG is lossless so planted pixel functions round-trip
    * exactly — which is what lets the decode be DuckDB-oracled with
    * closed-form sums.
    */
  object ImageCodec {

    /** Encode a width×height RGB PNG from a per-pixel function. */
    def encodePng(width: Int, height: Int,
        pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, b) = pixel(x, y)
          img.setRGB(x, y, ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode any ImageIO-supported payload to (dims, channels, exact
      * per-channel sums); None when the bytes aren't a decodable image.
      */
    /** Largest pixel count decoded (64 MP ≈ 256 MB raster): a decode
      * bomb — a tiny payload whose header declares e.g. 50000×50000 —
      * would otherwise make ImageIO allocate a multi-GB raster and die
      * with OutOfMemoryError, which is an Error (NOT caught by
      * NonFatal) and kills the executor. Dimensions are read from the
      * HEADER (no pixel decode) before any allocation happens.
      */
    val MaxPixels: Long = 64L * 1024 * 1024

    private[operators] def boundedRead(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val (w, h) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
          if (w <= 0 || h <= 0 || w * h > MaxPixels) None
          else Option(reader.read(0))
        } finally reader.dispose()
      } finally iis.close()
    }

    def decodeStats(id: Long, bytes: Array[Byte]): ImageStats = {
      val img =
        // NonFatal, not just IOException: hostile/garbled payloads can
        // surface as runtime exceptions from codec internals, and ONE
        // bad blob must not kill a 100 TB decode job (allocation bombs
        // are gated by the header check in boundedRead)
        try boundedRead(bytes)
        catch { case scala.util.control.NonFatal(_) => None }
      img match {
        case None =>
          ImageStats(id, None, None, None, None, None, None)
        case Some(im) =>
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < im.getHeight) {
            var x = 0
            while (x < im.getWidth) {
              val v = im.getRGB(x, y)
              sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
              x += 1
            }
            y += 1
          }
          ImageStats(id, Some(im.getWidth.toLong), Some(im.getHeight.toLong),
            Some(im.getColorModel.getNumComponents.toLong), Some(sr), Some(sg), Some(sb))
      }
    }
  }

  /** Deterministic planted image table over an id column: per id a
    * small RGB PNG whose pixel channels are closed-form functions of
    * (id, x, y) — R constant `id % 256`, G the gradient `x + y`, B the
    * product `x * y` (dims ≤ 16 keep both under 256, so no mod wrap and
    * the channel sums have polynomial closed forms an oracle computes
    * without decoding). Every 50th id gets non-image bytes to exercise
    * the corrupt-payload path end-to-end.
    */
  def plantedImages(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val bytes =
          if (id % 50 == 0) s"corrupt-payload-$id".getBytes("UTF-8")
          else {
            val w = (4 + id % 13).toInt
            val h = (4 + id % 11).toInt
            ImageCodec.encodePng(w, h, (x, y) => ((id % 256).toInt, x + y, x * y))
          }
        MediaRecord(id, bytes, if (id % 50 == 0) "bin" else "png", bytes.length.toLong)
      }
    }.toDF()
  }

  /** Batched per-partition REAL decode over a media table: same
    * mapPartitions shape as [[decodeFeatures]] but through the
    * `javax.imageio` codec, emitting exact integer stats.
    */
  def decodeImageStats(spark: SparkSession, media: DataFrame): Dataset[ImageStats] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // a costlier codec would amortize reader setup here, once per batch
      it.map(r => ImageCodec.decodeStats(r.id, r.content))
    }
  }

  /** Decoded audio statistics; all-null stats mark an undecodable
    * payload (same corrupt-row contract as [[ImageStats]]).
    */
  case class AudioStats(doc_id: Long, n_frames: Option[Long],
      n_channels: Option[Long], sample_rate: Option[Long],
      sum_ch0: Option[Long], sum_ch1: Option[Long],
      peak_ch0: Option[Long], peak_ch1: Option[Long])

  /** REAL audio codec — `javax.sound.sampled` ships in the JDK (WAV/
    * AIFF/AU containers, PCM payloads), so like [[ImageCodec]] the
    * decode needs no external dependency. Encoding exists to plant
    * deterministic fixtures; decoding is the production path. PCM is
    * lossless, so planted integer waveforms round-trip exactly and the
    * per-channel sums/peaks are closed-form oracle-checkable without
    * decoding. Only 16-bit signed PCM is accepted (the fixture's and
    * the overwhelmingly dominant interchange format); anything else —
    * or a container whose declared frame count disagrees with the bytes
    * actually present (truncation / header bomb) — surfaces as the
    * all-null corrupt row, never a crash.
    */
  object AudioCodec {

    /** Encode a WAV: 16-bit signed little-endian PCM, `samples(ch)(i)`. */
    def encodeWav(sampleRate: Int, samples: Array[Array[Short]]): Array[Byte] = {
      import javax.sound.sampled._
      val nCh = samples.length
      val n = samples(0).length
      require(samples.forall(_.length == n), "ragged channel arrays")
      val pcm = java.nio.ByteBuffer.allocate(n * nCh * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < nCh) { pcm.putShort(samples(c)(i)); c += 1 }
        i += 1
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, nCh, 2 * nCh, sampleRate.toFloat, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Frame-count cap (~128 MB of stereo 16-bit PCM): the audio
      * analogue of [[ImageCodec.MaxPixels]] — a header-declared length
      * is never trusted to size work before the bytes back it up.
      */
    val MaxFrames: Long = 32L * 1024 * 1024

    def decodeStats(id: Long, bytes: Array[Byte]): AudioStats = {
      import javax.sound.sampled._
      val nullRow = AudioStats(id, None, None, None, None, None, None, None)
      try {
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val nCh = fmt.getChannels
          val declared = ais.getFrameLength
          if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || nCh < 1 || nCh > 2 ||
              declared <= 0 || declared > MaxFrames) nullRow
          else {
            val want = declared * nCh * 2
            val pcm = ais.readNBytes(want.toInt)
            // truncated payload: header promises more frames than exist
            if (pcm.length < want) nullRow
            else {
              val bb = java.nio.ByteBuffer.wrap(pcm).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              val sums = new Array[Long](nCh)
              val peaks = new Array[Long](nCh)
              var i = 0L
              while (i < declared) {
                var c = 0
                while (c < nCh) {
                  val v = bb.getShort().toLong
                  sums(c) += v
                  val a = math.abs(v)
                  if (a > peaks(c)) peaks(c) = a
                  c += 1
                }
                i += 1
              }
              AudioStats(id, Some(declared), Some(nCh.toLong),
                Some(fmt.getSampleRate.toLong),
                Some(sums(0)), if (nCh > 1) Some(sums(1)) else None,
                Some(peaks(0)), if (nCh > 1) Some(peaks(1)) else None)
            }
          }
        } finally ais.close()
      } catch {
        // UnsupportedAudioFileException on non-audio bytes, plus any
        // codec-internal runtime exception on hostile payloads
        case scala.util.control.NonFatal(_) => nullRow
      }
    }
  }

  /** Deterministic planted audio table over an id column: per id a
    * stereo 16-bit PCM WAV whose samples are closed-form in (id, i) —
    * channel 0 the ramp `a + i` with `a = id % 100`, channel 1 the
    * squares `i²` — so per-channel sums and peaks have polynomial
    * closed forms an oracle computes without decoding (n ≤ 72 keeps
    * every sample well under 2¹⁵). Every 50th id gets non-audio bytes
    * to exercise the corrupt-payload path end-to-end.
    */
  def plantedAudio(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val bytes =
          if (id % 50 == 0) s"corrupt-audio-$id".getBytes("UTF-8")
          else {
            val n = (32 + id % 41).toInt
            val a = (id % 100).toInt
            val ch0 = Array.tabulate(n)(i => (a + i).toShort)
            val ch1 = Array.tabulate(n)(i => (i * i).toShort)
            AudioCodec.encodeWav(8000, Array(ch0, ch1))
          }
        MediaRecord(id, bytes, if (id % 50 == 0) "bin" else "wav", bytes.length.toLong)
      }
    }.toDF()
  }

  /** Batched per-partition REAL audio decode: same mapPartitions shape
    * as [[decodeImageStats]] but through `javax.sound.sampled`.
    */
  def decodeAudioStats(spark: SparkSession, media: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(r => AudioCodec.decodeStats(r.id, r.content))
    }
  }

  /** Decoded video statistics; all-null stats mark an undecodable
    * container (same corrupt-row contract as [[ImageStats]]). Channel
    * sums aggregate over EVERY frame's pixels.
    */
  case class VideoStats(doc_id: Long, n_frames: Option[Long],
      width: Option[Long], height: Option[Long],
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long])

  /** REAL video codec — RIFF/AVI container walk (RIFF is the WAV
    * container's family: fourcc + little-endian u32 size chunks, LIST
    * nesting) with two frame codecs behind one dispatch:
    *
    *  - `MJPG` (Motion-JPEG): every `00dc` chunk is a standalone JPEG,
    *    decoded through the SAME `javax.imageio` path as [[ImageCodec]]
    *    — the JDK ships no inter-frame video codec, but MJPEG is
    *    intra-frame only, so AVI+MJPEG is the one mainstream video
    *    format a dependency-free JVM can fully decode.
    *  - `BI_RGB` (uncompressed 24-bit DIB, biCompression=0): raw
    *    bottom-up BGR rows, stride padded to 4 bytes. Lossless — which
    *    is what lets planted pixel functions round-trip exactly and the
    *    decode be DuckDB-oracled with closed-form sums (JPEG's DCT
    *    quantization is lossy, so the MJPG path is spec-verified
    *    against direct per-frame ImageIO decodes instead).
    *
    * Every size field in the container is UNTRUSTED: chunk walks are
    * bounds-checked against the actual byte count, per-frame dimensions
    * gate on [[ImageCodec.MaxPixels]] BEFORE any allocation, the frame
    * count gates on [[MaxFrames]], and a declared frame count the movi
    * list can't back up (truncation) yields the all-null row — never a
    * crash, never an unbounded allocation.
    */
  object VideoCodec {

    /** Container-declared frame-count cap — with per-frame dims capped
      * by [[ImageCodec.MaxPixels]], bounds decode work per payload.
      */
    val MaxFrames: Long = 1L << 16

    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | (b(o + 1) & 0xFFL) << 8 |
        (b(o + 2) & 0xFFL) << 16 | (b(o + 3) & 0xFFL) << 24

    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parsed container: frame dims, stream compression fourcc ("MJPG"
      * or "\0\0\0\0" for BI_RGB), declared frame count, and the movi
      * chunks' (offset, length) — frame BYTES are not copied here.
      */
    private[operators] case class AviInfo(width: Int, height: Int,
        compression: String, declaredFrames: Long, frames: Vector[(Int, Int)])

    /** Walk the RIFF tree; None on anything malformed. Offsets are Long
      * internally so hostile u32 sizes can't overflow Int arithmetic.
      */
    private[operators] def parseAvi(bytes: Array[Byte]): Option[AviInfo] = {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
          fourcc(bytes, 8) != "AVI ") return None
      // truncation check: the header's promise vs the bytes present
      if (u32(bytes, 4) + 8 > bytes.length) return None
      var width = 0; var height = 0; var declared = -1L
      var compression: String = null
      val frames = Vector.newBuilder[(Int, Int)]
      // (start, end) regions of chunk sequences to walk; LIST bodies are
      // pushed rather than recursed so a deeply nested hostile container
      // can't overflow the stack
      var regions = List((12L, math.min(u32(bytes, 4) + 8, bytes.length.toLong)))
      var inVids = false
      while (regions.nonEmpty) {
        val (start, end) = regions.head
        regions = regions.tail
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(bytes, off.toInt)
          val sz = u32(bytes, off.toInt + 4)
          val body = off + 8
          if (body + sz > end) return None // chunk overruns its region
          id match {
            case "LIST" if sz >= 4 =>
              regions = (body + 4, body + sz) :: regions
            case "avih" if sz >= 56 =>
              declared = u32(bytes, body.toInt + 16)
              width = u32(bytes, body.toInt + 32).toInt
              height = u32(bytes, body.toInt + 36).toInt
            case "strh" if sz >= 8 =>
              inVids = fourcc(bytes, body.toInt) == "vids"
            case "strf" if sz >= 40 && inVids =>
              // BITMAPINFOHEADER.biCompression at +16
              compression = fourcc(bytes, body.toInt + 16)
            case id if (id == "00dc" || id == "00db") && sz <= Int.MaxValue =>
              frames += ((body.toInt, sz.toInt))
            case _ => () // unknown chunks (idx1, JUNK, …) skip cleanly
          }
          off = body + sz + (sz & 1) // chunks are word-aligned
        }
      }
      if (width <= 0 || height <= 0 || declared < 0 || compression == null) None
      else Some(AviInfo(width, height, compression, declared, frames.result()))
    }

    private val BiRgb = "\u0000\u0000\u0000\u0000" // biCompression = 0 (BI_RGB)

    def decodeStats(id: Long, bytes: Array[Byte]): VideoStats = {
      val nullRow = VideoStats(id, None, None, None, None, None, None)
      try {
        parseAvi(bytes) match {
          case None => nullRow
          case Some(avi) =>
            val w = avi.width; val h = avi.height
            if (w.toLong * h > ImageCodec.MaxPixels ||
                avi.declaredFrames > MaxFrames ||
                // a declared count the movi chunks can't back up is a
                // truncated or forged container
                avi.frames.length != avi.declaredFrames ||
                avi.frames.isEmpty) nullRow
            else if (avi.compression == "MJPG") {
              var (sr, sg, sb) = (0L, 0L, 0L)
              var ok = true
              avi.frames.foreach { case (off, len) =>
                if (ok) {
                  val fb = java.util.Arrays.copyOfRange(bytes, off, off + len)
                  ImageCodec.boundedRead(fb) match {
                    // a frame whose own dims disagree with the stream
                    // header is as corrupt as an undecodable one
                    case Some(im) if im.getWidth == w && im.getHeight == h =>
                      var y = 0
                      while (y < h) {
                        var x = 0
                        while (x < w) {
                          val v = im.getRGB(x, y)
                          sr += (v >> 16) & 0xFF; sg += (v >> 8) & 0xFF; sb += v & 0xFF
                          x += 1
                        }
                        y += 1
                      }
                    case _ => ok = false
                  }
                }
              }
              if (!ok) nullRow
              else VideoStats(id, Some(avi.frames.length.toLong),
                Some(w.toLong), Some(h.toLong), Some(sr), Some(sg), Some(sb))
            } else if (avi.compression == BiRgb) {
              val stride = (w * 3 + 3) & ~3
              if (avi.frames.exists(_._2 != stride * h)) nullRow
              else {
                var (sr, sg, sb) = (0L, 0L, 0L)
                avi.frames.foreach { case (off, _) =>
                  var y = 0
                  while (y < h) { // channel sums are row-order-invariant
                    val row = off + y * stride
                    var x = 0
                    while (x < w) {
                      sb += bytes(row + 3 * x) & 0xFF
                      sg += bytes(row + 3 * x + 1) & 0xFF
                      sr += bytes(row + 3 * x + 2) & 0xFF
                      x += 1
                    }
                    y += 1
                  }
                }
                VideoStats(id, Some(avi.frames.length.toLong),
                  Some(w.toLong), Some(h.toLong), Some(sr), Some(sg), Some(sb))
              }
            } else nullRow // unsupported fourcc
        }
      } catch {
        // codec-internal runtime exceptions on hostile payloads
        case scala.util.control.NonFatal(_) => nullRow
      }
    }

    /** Encode a minimal standard AVI: RIFF(hdrl(avih, strl(strh,
      * strf)), movi(00dc…)). `fcc` is "MJPG" or null for BI_RGB;
      * `frameBytes` are pre-encoded frame payloads.
      */
    def encodeAvi(width: Int, height: Int, fcc: Option[String],
        frameBytes: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      val zero4 = le32(0)
      val nF = frameBytes.length
      val avih = Array.concat(le32(66667), zero4, zero4, zero4, le32(nF),
        zero4, le32(1), zero4, le32(width), le32(height),
        zero4, zero4, zero4, zero4)
      val strh = Array.concat(cc("vids"), fcc.map(cc).getOrElse(zero4),
        zero4, zero4 /* prio+lang */, zero4, le32(1) /* scale */,
        le32(15) /* rate */, zero4, le32(nF), zero4, le32(-1L & 0xFFFFFFFFL),
        zero4 /* sampleSize */, Array[Byte](0, 0, 0, 0) /* rcFrame l,t */,
        Array((width & 0xFF).toByte, ((width >> 8) & 0xFF).toByte,
          (height & 0xFF).toByte, ((height >> 8) & 0xFF).toByte))
      val maxFrame = if (nF == 0) 0 else frameBytes.map(_.length).max
      val strf = Array.concat(le32(40), le32(width), le32(height),
        Array[Byte](1, 0, 24, 0), fcc.map(cc).getOrElse(zero4),
        le32(maxFrame.toLong), zero4, zero4, zero4, zero4)
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
        Array.concat(cc(id), le32(body.length.toLong), body, pad)
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        Array.concat(cc("LIST"), le32(body.length + 4L), cc(kind), body)
      val hdrl = list("hdrl", Array.concat(chunk("avih", avih),
        list("strl", Array.concat(chunk("strh", strh), chunk("strf", strf)))))
      val movi = list("movi",
        Array.concat(frameBytes.map(chunk("00dc", _)): _*))
      val body = Array.concat(cc("AVI "), hdrl, movi)
      out.write(cc("RIFF")); out.write(le32(body.length.toLong)); out.write(body)
      out.toByteArray
    }

    /** Encode an uncompressed-DIB AVI from a per-pixel function
      * `pixel(x, y, frame) => (r, g, b)` — the lossless planting path.
      */
    def encodeAviDib(width: Int, height: Int, nFrames: Int,
        pixel: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val stride = (width * 3 + 3) & ~3
      val frames = (0 until nFrames).map { f =>
        val b = new Array[Byte](stride * height)
        var y = 0
        while (y < height) {
          // DIB rows are stored bottom-up: buffer row (height-1-y) holds
          // image row y
          val row = (height - 1 - y) * stride
          var x = 0
          while (x < width) {
            val (r, g, bl) = pixel(x, y, f)
            b(row + 3 * x) = bl.toByte
            b(row + 3 * x + 1) = g.toByte
            b(row + 3 * x + 2) = r.toByte
            x += 1
          }
          y += 1
        }
        b
      }
      encodeAvi(width, height, None, frames)
    }

    /** Encode an MJPEG AVI: each frame a real ImageIO-written JPEG. */
    def encodeAviMjpg(width: Int, height: Int, nFrames: Int,
        pixel: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val (r, g, b) = pixel(x, y, f)
            img.setRGB(x, y, ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF))
            x += 1
          }
          y += 1
        }
        val o = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", o)
        o.toByteArray
      }
      encodeAvi(width, height, Some("MJPG"), frames)
    }
  }

  /** Deterministic planted video table over an id column: per id a
    * small uncompressed-DIB AVI whose pixel channels are closed-form in
    * (id, x, y, frame) — R constant `id % 200`, G the gradient
    * `x + y + f`, B the product `x * y` (dims ≤ 12, frames ≤ 5 keep
    * every channel < 256, so the per-container channel sums have
    * polynomial closed forms an oracle computes without decoding —
    * see [[VideoCodec]] for why the planting codec is the lossless
    * one). Every 50th id gets non-video bytes to exercise the corrupt-
    * payload path end-to-end.
    */
  def plantedVideos(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val bytes =
          if (id % 50 == 0) s"corrupt-video-$id".getBytes("UTF-8")
          else {
            val w = (4 + id % 9).toInt
            val h = (4 + id % 7).toInt
            val nF = (2 + id % 4).toInt
            VideoCodec.encodeAviDib(w, h, nF,
              (x, y, f) => ((id % 200).toInt, x + y + f, x * y))
          }
        MediaRecord(id, bytes, if (id % 50 == 0) "bin" else "avi", bytes.length.toLong)
      }
    }.toDF()
  }

  /** Batched per-partition REAL video decode: same mapPartitions shape
    * as [[decodeImageStats]] but through the RIFF/AVI walk. Optional
    * `parallelism` repartition spreads decode cost evenly when the
    * upstream file layout is skewed (media blobs usually are).
    */
  def decodeVideoStats(spark: SparkSession, media: DataFrame,
      parallelism: Int = 0): Dataset[VideoStats] = {
    import spark.implicits._
    val balanced = if (parallelism > 0) media.repartition(parallelism) else media
    balanced.as[MediaRecord].mapPartitions { it =>
      it.map(r => VideoCodec.decodeStats(r.id, r.content))
    }
  }

  /** One sampled frame of a video payload: the actual per-frame bytes
    * (for MJPEG, each a standalone JPEG).
    */
  case class Frame(id: Long, frameIdx: Int, nFrames: Int, frameBytes: Array[Byte])

  /** REAL frame sampling: 1 record → N rows (generator shape), keeping
    * every `everyN`th frame of each AVI payload's movi list. Containers
    * that don't parse (or whose declared frame count the chunks can't
    * back up) contribute zero rows — frame EXTRACTION is a filter, not
    * a stats pass, so the all-null-row contract of the decode paths
    * doesn't apply.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      everyN: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        VideoCodec.parseAvi(r.content) match {
          case Some(avi) if avi.frames.length == avi.declaredFrames =>
            val total = avi.frames.length
            (0 until total by everyN).iterator.map { f =>
              val (off, len) = avi.frames(f)
              Frame(r.id, f, total,
                java.util.Arrays.copyOfRange(r.content, off, off + len))
            }
          case _ => Iterator.empty
        }
      }
    }
  }

  /** REAL resize: decode any ImageIO-supported payload, rescale to
    * `(width, height)` with bilinear AWT drawing, re-encode as PNG.
    * Undecodable payloads pass through with empty content (the
    * downstream-visible corrupt marker — models need the fixed output
    * SHAPE, so undecodable rows must be droppable by a length filter).
    */
  def resizeImages(spark: SparkSession, media: DataFrame, width: Int,
      height: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val resized = ImageCodec.boundedRead(r.content) match {
          case None => Array.emptyByteArray
          case Some(im) =>
            val out = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(im, 0, 0, width, height, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            bos.toByteArray
        }
        r.copy(content = resized, nBytes = resized.length.toLong)
      }
    }
  }
}
