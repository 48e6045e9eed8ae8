package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): treat media payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as a batched per-partition pass.
  *
  * The Spark-side architecture is the real deliverable here — schema
  * (id, content: binary, meta struct), partition-parallel batched
  * processing via `mapPartitions` on a typed Dataset (the JVM analogue
  * of `mapInPandas`: one iterator per partition, amortized setup, no
  * per-row UDF dispatch), and a columnar-friendly output schema. The
  * actual media decode is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake so the pipeline is testable
  * end-to-end; swap [[MediaDecoder.decode]] for a real codec in
  * production.
  */
object Multimodal {

  /** One media record: payload bytes + metadata a catalog would carry. */
  case class MediaRecord(id: Long, content: Array[Byte], format: String, nBytes: Long)

  /** Extracted features: fixed-width vector + payload digest. */
  case class MediaFeatures(id: Long, nBytes: Long, checksum: Long, features: Array[Float])

  /** ======= STUB =======
    * Deterministic fake decoder standing in for a real image/audio
    * codec. Produces an 8-dim "feature vector" from byte statistics and
    * a rolling checksum — stable across runs, partitionings, and JVMs.
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
