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
  * images ([[ImageCodec]], `javax.imageio`: PNG/BMP/GIF/JPEG) and audio
  * ([[AudioCodec]], `javax.sound.sampled`: WAV/AIFF/AU PCM), both
  * JDK-built-in with zero extra dependencies. Video codecs alone aren't
  * in the JDK, so the frame sampling / resize steps remain
  * deterministic stand-ins ([[MediaDecoder]]) exercising the same
  * plumbing.
  */
object Multimodal {

  /** One media record: payload bytes + metadata a catalog would carry. */
  case class MediaRecord(id: Long, content: Array[Byte], format: String, nBytes: Long)

  /** Extracted features: fixed-width vector + payload digest. */
  case class MediaFeatures(id: Long, nBytes: Long, checksum: Long, features: Array[Float])

  /** ======= STUB (video-only) =======
    * Deterministic fake decoder standing in for a real VIDEO codec
    * (image decode is real via [[ImageCodec]]/`javax.imageio`; audio is
    * real via [[AudioCodec]]/`javax.sound.sampled` — video codecs alone
    * aren't in the JDK). Produces an 8-dim "feature vector" from byte
    * statistics and a rolling checksum — stable across runs,
    * partitionings, and JVMs.
    */
  object MediaDecoder {
    val FeatureDim = 8

    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.content
      var checksum = 1469598103934665603L // FNV-1a offset basis
      val hist = new Array[Long](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        checksum = (checksum ^ (bytes(i) & 0xFFL)) * 1099511628211L
        hist((bytes(i) & 0xFF) % FeatureDim) += 1
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      MediaFeatures(r.id, r.nBytes, checksum, hist.map(_ / n))
    }
  }

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

  /** Batched per-partition decode: the mapInPandas-shaped hot path.
    * Repartitions to `parallelism` so decode cost spreads evenly even
    * when the upstream file layout is skewed (media blobs usually are).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      parallelism: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val balanced = if (parallelism > 0) media.repartition(parallelism) else media
    balanced.as[MediaRecord].mapPartitions { it =>
      // per-partition setup would open the real codec once here
      it.map(MediaDecoder.decode)
    }
  }

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

    private def boundedRead(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
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

  /** One sampled "frame" of a media payload. */
  case class Frame(id: Long, frameIdx: Int, nFrames: Int, frameBytes: Array[Byte])

  /** ======= STUB =======
    * Frame sampling: 1 record -> N rows (generator shape). A real video
    * decoder would emit every Nth decoded frame; the stub slices the
    * payload into fixed-size "frames" and keeps every `everyN`th — the
    * row-explosion semantics, batching, and output schema are the real
    * plumbing under test.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameSize: Int = 64,
      everyN: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val total = math.max(1, (r.content.length + frameSize - 1) / frameSize)
        (0 until total by everyN).iterator.map { f =>
          val from = f * frameSize
          val until = math.min(from + frameSize, r.content.length)
          Frame(r.id, f, total, java.util.Arrays.copyOfRange(r.content, from, until))
        }
      }
    }
  }

  /** ======= STUB =======
    * Resize: normalize every payload to a fixed byte budget (a real
    * implementation would rescale pixels; the stub truncates/right-pads,
    * preserving the fixed-output-shape contract downstream models need).
    */
  def resizeTo(spark: SparkSession, media: DataFrame, nBytes: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val out = java.util.Arrays.copyOf(r.content, nBytes)
        r.copy(content = out, nBytes = nBytes.toLong)
      }
    }
  }
}
