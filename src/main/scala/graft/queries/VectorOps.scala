package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.operators.OrderByOnce.Ops
import graft.tables.Tables
import graft.functions.VectorFunctions._
import graft.functions.CentroidAggregator
import graft.operators.{Ann, Multimodal}

/** Embedding / similarity-search / multimodal surface (SURVEY.md §2.9).
  *
  * All cosine math goes through the exact scaled-integer dot product
  * (see [[graft.functions.VectorFunctions]]) so declared results are
  * hash-stable against DuckDB. Oracle SQL reconstructs the identical
  * arithmetic with a generate_series(1,64) lateral over the fixed-width
  * embedding.
  */
object VectorOps {

  /** DuckDB fragment: the three scaled dot sums for (x, y) vector pairs,
    * given `pos` from a generate_series lateral.
    */
  private def dotsSql(x: String, y: String) = Seq(
    s"${dotScaledSql(x, y)} AS dab",
    s"${dotScaledSql(x, x)} AS daa",
    s"${dotScaledSql(y, y)} AS dbb").mkString(", ")

  private val cosSql = cosineFromScaledSql("dab", "daa", "dbb")

  /** Brute-force cosine top-20 against the vec_id=0 query vector. */
  def vecCosineTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
    Ann.bruteForceTopK(
      e.filter(col("vec_id") =!= 0), e.filter(col("vec_id") === 0),
      "embedding", "vec_id", 20)
      .withColumnRenamed("vec_id", "vec_id")
  }

  val vecCosineTopkSql: String =
    s"""WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
       |dots AS (
       |  SELECT v.vec_id, ${dotsSql("v.embedding", "q.e")}
       |  FROM embeddings v, q, generate_series(1, 64) AS t(pos)
       |  WHERE v.vec_id <> 0
       |  GROUP BY v.vec_id)
       |SELECT vec_id, round($cosSql, 6) AS cos
       |FROM dots ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin

  /** Batched exact top-k: every query vector (vec_id < 5) gets its own
    * cosine top-5 against the corpus in ONE pass — the broadcast carries
    * all query vectors and per-query heads come from one ranked window,
    * not one job per query (the N-query ANN shape; the index-backed
    * batch probes in [[Ann.ivfProbeBatch]]/[[Ann.lshProbeBatch]] share
    * it).
    */
  def vecTopkBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
    Ann.bruteForceTopKBatch(e.filter(col("vec_id") >= 5), e.filter(col("vec_id") < 5),
      "embedding", "vec_id", "vec_id", 5)
      .orderBy(col("query_id"), col("cos").desc, col("vec_id"))
  }

  val vecTopkBatchSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS e FROM embeddings WHERE vec_id < 5),
       |dots AS (
       |  SELECT q.query_id, v.vec_id, ${dotsSql("v.embedding", "q.e")}
       |  FROM embeddings v, q, generate_series(1, 64) AS t(pos)
       |  WHERE v.vec_id >= 5
       |  GROUP BY q.query_id, v.vec_id),
       |scored AS (
       |  SELECT query_id, vec_id, round($cosSql, 6) AS cos FROM dots),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 5
       |ORDER BY query_id, cos DESC, vec_id""".stripMargin

  /** Label-blocked all-pairs similarity join (cos > 0.25). Blocking by
    * label keeps the pair space at sum(block²) instead of n² — the same
    * shape an LSH bucket join has at scale. No ε-grid sub-block here
    * (contrast [[dedupEmbeddingNeardup]]): at threshold 0.25 the
    * lossless cell width is sqrt(2 − 0.5) ≈ 1.22, wider than the
    * projection's whole range, so the grid would put everything in one
    * cell — the low threshold genuinely requires the full block join.
    */
  def vecSimJoinBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
      .withColumn("nsq", normSq(col("embedding")))
    val a = e.select(col("label"), col("vec_id").as("a"),
      col("embedding").as("va"), col("nsq").as("na"))
    val b = e.select(col("label"), col("vec_id").as("b"),
      col("embedding").as("vb"), col("nsq").as("nb"))
    a.join(b, Seq("label")).filter(col("a") < col("b"))
      .withColumn("cos", cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") > 0.25)
      .select(col("label"), col("a"), col("b"), round(col("cos"), 4).as("cos"))
      .orderBy("label", "a", "b")
  }

  val vecSimJoinBlockedSql: String =
    s"""WITH dots AS (
       |  SELECT x.label, x.vec_id AS a, y.vec_id AS b, ${dotsSql("x.embedding", "y.embedding")}
       |  FROM embeddings x JOIN embeddings y ON x.label = y.label AND x.vec_id < y.vec_id,
       |   generate_series(1, 64) AS t(pos)
       |  GROUP BY x.label, x.vec_id, y.vec_id)
       |SELECT label, a, b, round($cosSql, 4) AS cos
       |FROM dots WHERE $cosSql > 0.25
       |ORDER BY label, a, b""".stripMargin

  /** Embedding near-duplicate detection: plant perturbed copies
    * (+0.02 per element, id offset 1M), then label-blocked pairs with
    * cos >= 0.98 — the planted pairs dominate, any organic ones ride
    * along.
    *
    * Runs through [[graft.operators.EmbeddingNearDup.cosinePairs]]: the
    * join key is (label, ε-grid cell) — the secondary grid key bounds a
    * hot label's pair blowup at 100 TB and is lossless at cos >= 0.98
    * (equivalence with the plain label join asserted in ProjGridSpec
    * and by this query's own oracle, which knows nothing of the grid).
    */
  def dedupEmbeddingNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val corpus = e.unionByName(e.select(
      (col("vec_id") + 1000000).as("vec_id"), col("label"),
      transform(col("embedding"), x => x + lit(0.02)).as("embedding")))
    graft.operators.EmbeddingNearDup.cosinePairs(
        corpus, "embedding", "vec_id", Seq("label"), minCos = 0.98)
      .orderBy("a", "b")
  }

  val dedupEmbeddingNeardupSql: String =
    s"""WITH corpus AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000, label, list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.02) FROM embeddings),
       |dots AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b, ${dotsSql("x.embedding", "y.embedding")}
       |  FROM corpus x JOIN corpus y ON x.label = y.label AND x.vec_id < y.vec_id,
       |   generate_series(1, 64) AS t(pos)
       |  GROUP BY x.vec_id, y.vec_id)
       |SELECT a, b, round($cosSql, 6) AS cos
       |FROM dots WHERE $cosSql >= 0.98
       |ORDER BY a, b""".stripMargin

  /** SemDeDup-shaped semantic dedup END-TO-END (round 10): the ε-grid
    * cosine pairs (same lossless blocked candidate generation as
    * `dedup_embedding_neardup`) resolved into clusters by connected
    * components, every vector labeled with its cluster representative
    * (min id). A pipeline keeps `id == component` rows — one
    * representative per near-duplicate embedding cluster.
    *
    * Output column is named `doc_id` by the split-oracle contract:
    * tools/check.py replaces the recursive closure below the
    * ORACLE-SPLIT sentinel with an exact union-find over the
    * `corpus(doc_id)` / `pairs(a, b)` CTE prefix at sweep scales where
    * the recursive CTE is disk-infeasible (same contract as
    * `dedup_docs_components`).
    */
  def dedupEmbeddingSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val corpus = e.unionByName(e.select(
      (col("vec_id") + 1000000).as("vec_id"), col("label"),
      transform(col("embedding"), x => x + lit(0.02)).as("embedding")))
    val pairs = graft.operators.EmbeddingNearDup.cosinePairs(
      corpus, "embedding", "vec_id", Seq("label"), minCos = 0.98)
    val comp = graft.operators.ConnectedComponents.resolve(pairs, "a", "b")
    val out = corpus.select(col("vec_id").as("doc_id"))
      .join(comp, col("doc_id") === comp("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .orderBy("doc_id")
    graft.operators.CacheLifecycle.releaseAfterAction(out, Seq(comp))
  }

  val dedupEmbeddingSemanticSql: String =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT vec_id AS doc_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000, label, list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.02) FROM embeddings),
       |dots AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, ${dotsSql("x.embedding", "y.embedding")}
       |  FROM corpus x JOIN corpus y ON x.label = y.label AND x.doc_id < y.doc_id,
       |   generate_series(1, 64) AS t(pos)
       |  GROUP BY x.doc_id, y.doc_id),
       |pairs AS (SELECT a, b FROM dots WHERE $cosSql >= 0.98),
       |-- ORACLE-SPLIT (contract with tools/check.py components_oracle):
       |-- the CTE prefix above defines corpus(doc_id, ...) and
       |-- pairs(a, b); check.py replaces the recursive closure below
       |-- with an exact union-find over them at sweep scales.
       |edges AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b AS u, a AS v FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS lbl FROM corpus
       |  UNION
       |  SELECT e.v AS id, r.lbl FROM reach r JOIN edges e ON e.u = r.id)
       |SELECT id AS doc_id, min(lbl) AS component FROM reach
       |GROUP BY id ORDER BY doc_id""".stripMargin

  /** Per-label centroid via the custom typed Aggregator (SURVEY.md
    * §2.10 showcase), exploded to (label, pos, mean).
    */
  def vecCentroidByLabel(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[Array[Float]] =
      ExpressionEncoder[Array[Float]]()
    val centroid = udaf(new CentroidAggregator(64))
    Tables(spark, sfDir).embeddings
      .groupBy("label")
      .agg(centroid(col("embedding")).as("centroid"))
      .select(col("label"), posexplode(col("centroid")))
      .select(col("label"), (col("pos") + 1).as("pos"),
        round(col("col"), 6).as("mean_val"))
      .orderBy("label", "pos")
  }

  val vecCentroidByLabelSql: String =
    """SELECT label, pos,
      | round(CAST(sum(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / count(*), 6) AS mean_val
      |FROM embeddings, generate_series(1, 64) AS t(pos)
      |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  /** Nearest-centroid assignment (the IVF/k-means "assign" step as a
    * first-class query): label centroids via the exact scaled-integer
    * mean, every vector assigned to its nearest centroid by squared L2
    * (per-dimension terms floored to integers so the argmin is
    * hash-stable cross-engine), reported as a label-vs-assigned
    * confusion matrix. Plan shape: one shuffle for the centroid
    * aggregate, then the 10-row centroid table BROADCASTs into a
    * zip_with/aggregate fold — the distance stage never shuffles the
    * corpus, which is the property that matters at 10^9 vectors.
    */
  def vecClusterAssign(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, sfDir).embeddings
    val cent = e
      .select(col("label").as("clabel"), posexplode(col("embedding")))
      .select(col("clabel"), col("pos"),
        floor(col("col").cast("double") * 1e9).cast("long").as("s"))
      .groupBy("clabel", "pos")
      .agg(sum(col("s")).as("ssum"), count(lit(1)).as("n"))
      .groupBy("clabel")
      .agg(array_sort(collect_list(struct(col("pos"),
        (col("ssum").cast("double") / 1e9 / col("n")).as("c")))).as("ps"))
      .select(col("clabel"), transform(col("ps"), p => p.getField("c")).as("cvec"))
    val d2 = e.join(broadcast(cent))
      .select(col("vec_id"), col("label"), col("clabel"),
        aggregate(
          zip_with(col("embedding"), col("cvec"), (y, c) =>
            floor((y.cast("double") - c) * (y.cast("double") - c) * 1e9).cast("long")),
          lit(0L), (acc, x) => acc + x).as("d2"))
    d2.withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))))
      .where(col("rn") === 1)
      .groupBy(col("label"), col("clabel").as("assigned"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "assigned")
  }

  val vecClusterAssignSql: String =
    """WITH cent AS (
      |  SELECT label AS clabel, pos,
      |    CAST(sum(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / count(*) AS c
      |  FROM embeddings, generate_series(1, 64) AS t(pos)
      |  GROUP BY label, pos),
      |dist AS (
      |  SELECT e.vec_id, e.label, c.clabel,
      |    sum(CAST(floor((CAST(e.embedding[c.pos] AS DOUBLE) - c.c) * (CAST(e.embedding[c.pos] AS DOUBLE) - c.c) * 1e9) AS BIGINT)) AS d2
      |  FROM embeddings e, cent c
      |  GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT vec_id, label, clabel,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
      |  FROM dist)
      |SELECT label, clabel AS assigned, count(*) AS n
      |FROM best WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ANN via random-hyperplane LSH, multi-probe (rows-only: bucket
    * assignment depends on engine-side hyperplane constants; recall vs
    * brute force asserted in AnnSpec).
    */
  def annCosineLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
    Ann.lshTopK(e.filter(col("vec_id") =!= 0), e.filter(col("vec_id") === 0),
      "embedding", "vec_id", k = 10)
      .orderBy(col("cos").desc, col("vec_id"))
  }

  /** ANN via IVF / k-means cells (rows-only: cell assignment depends on
    * the trained model; recall vs brute force asserted in AnnSpec).
    */
  def annCosineIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
    Ann.ivfTopK(e.filter(col("vec_id") =!= 0), e.filter(col("vec_id") === 0),
      "embedding", "vec_id", k = 10)
      .orderBy(col("cos").desc, col("vec_id"))
  }

  /** ANN via product quantization + exact re-rank (rows-only: the
    * candidate set depends on the trained codebooks; AnnSpec asserts
    * recall vs brute force and the ADC/encode kernel contracts). The
    * scale story is the compressed-representation scan: the ADC stage
    * reads only (id, m codes) — at 100 TB that table is ~32× smaller
    * than the embeddings — and the full vectors are touched only for
    * the k·rerankFactor re-rank candidates.
    */
  def annCosinePq(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
    Ann.pqTopK(e.filter(col("vec_id") =!= 0), e.filter(col("vec_id") === 0),
      "embedding", "vec_id", k = 10)
      .orderBy(col("cos").desc, col("vec_id"))
  }

  /** ANN via the COMPOSED IVF-PQ layout (rows-only: the candidate set
    * depends on both trained quantizers; AnnSpec pins recall and the
    * equal-byte-budget trade vs IVF alone). The scale story stacks the
    * two reductions: a probe reads only the nProbe nearest cells'
    * PARTITIONS (static pruning from the literal cell list) and inside
    * them only the ~32×-compressed code rows; raw vectors are touched
    * for the k·rerankFactor re-rank candidates alone — the production
    * shape at 10⁹+ vectors.
    */
  def annCosineIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).embeddings
    Ann.ivfPqTopK(e.filter(col("vec_id") =!= 0), e.filter(col("vec_id") === 0),
      "embedding", "vec_id", k = 10)
      .orderBy(col("cos").desc, col("vec_id"))
  }

  /** Multimodal decode, REAL codec end-to-end: plant a deterministic
    * PNG per doc_id (pixel channels are closed-form in (id, x, y)),
    * decode the actual bytes with `javax.imageio` in a batched
    * per-partition pass, and emit exact integer stats. The DuckDB
    * oracle computes the same stats analytically WITHOUT decoding —
    * only a real decode of the planted payloads can hash-match it.
    * Corrupt payloads (every 50th id) surface as all-null stat rows on
    * both sides.
    */
  def mmDecodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.plantedImages(
      spark, Tables(spark, sfDir).documents, "doc_id")
    Multimodal.decodeImageStats(spark, media).toDF().orderByOnce("doc_id")
  }

  /** Multimodal audio decode, REAL codec end-to-end: plant a
    * deterministic stereo 16-bit PCM WAV per doc_id (samples are
    * closed-form in (id, i)), decode the actual container + payload
    * bytes with `javax.sound.sampled` in a batched per-partition pass,
    * and emit exact integer stats. The DuckDB oracle computes the same
    * stats analytically WITHOUT decoding — only a real decode of the
    * planted payloads can hash-match it. Corrupt payloads (every 50th
    * id) surface as all-null stat rows on both sides.
    */
  def mmDecodeAudio(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.plantedAudio(
      spark, Tables(spark, sfDir).documents, "doc_id")
    Multimodal.decodeAudioStats(spark, media).toDF().orderByOnce("doc_id")
  }

  /** Multimodal video decode, REAL container + codec end-to-end: plant
    * a deterministic uncompressed-DIB AVI per doc_id (pixel channels
    * are closed-form in (id, x, y, frame)), walk the actual RIFF/AVI
    * container bytes and read every frame's raster in a batched
    * per-partition pass, and emit exact integer stats. The DuckDB
    * oracle computes the same stats analytically WITHOUT decoding —
    * only a real parse + decode of the planted payloads can hash-match
    * it. (The MJPEG-through-`javax.imageio` path of the same codec is
    * spec-verified instead — JPEG quantization has no closed form.)
    * Corrupt payloads (every 50th id) surface as all-null stat rows on
    * both sides.
    */
  def mmDecodeVideo(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.plantedVideos(
      spark, Tables(spark, sfDir).documents, "doc_id")
    Multimodal.decodeVideoStats(spark, media).toDF().orderBy("doc_id")
  }

  val mmDecodeVideoSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    4 + doc_id % 9 AS w,
      |    4 + doc_id % 7 AS h,
      |    2 + doc_id % 4 AS f,
      |    doc_id % 200 AS r,
      |    doc_id % 50 = 0 AS corrupt
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE f END AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE w END AS BIGINT) AS width,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE h END AS BIGINT) AS height,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE f * w * h * r END AS BIGINT) AS sum_r,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE f * (h * (w * (w - 1)) / 2 + w * (h * (h - 1)) / 2) + w * h * (f * (f - 1) / 2) END AS BIGINT) AS sum_g,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE f * (w * (w - 1) / 2) * (h * (h - 1) / 2) END AS BIGINT) AS sum_b
      |FROM p ORDER BY doc_id""".stripMargin

  val mmDecodeAudioSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    32 + doc_id % 41 AS n,
      |    doc_id % 100 AS a,
      |    doc_id % 50 = 0 AS corrupt
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE n END AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE 2 END AS BIGINT) AS n_channels,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE 8000 END AS BIGINT) AS sample_rate,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE n * a + n * (n - 1) / 2 END AS BIGINT) AS sum_ch0,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE (n - 1) * n * (2 * n - 1) / 6 END AS BIGINT) AS sum_ch1,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE a + n - 1 END AS BIGINT) AS peak_ch0,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE (n - 1) * (n - 1) END AS BIGINT) AS peak_ch1
      |FROM p ORDER BY doc_id""".stripMargin

  val mmDecodeFeaturesSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    4 + doc_id % 13 AS w,
      |    4 + doc_id % 11 AS h,
      |    doc_id % 256 AS r,
      |    doc_id % 50 = 0 AS corrupt
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE w END AS BIGINT) AS width,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE h END AS BIGINT) AS height,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE 3 END AS BIGINT) AS n_channels,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE w * h * r END AS BIGINT) AS sum_r,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE h * (w * (w - 1)) / 2 + w * (h * (h - 1)) / 2 END AS BIGINT) AS sum_g,
      |  CAST(CASE WHEN corrupt THEN NULL ELSE (w * (w - 1) / 2) * (h * (h - 1) / 2) END AS BIGINT) AS sum_b
      |FROM p ORDER BY doc_id""".stripMargin

  /** Distributed k-means FIT (Lloyd's algorithm, 3 rounds, k = 8) on
    * the integer lattice — the missing half of the clustering surface
    * ([[vecClusterAssign]] is the assign step against GIVEN centroids;
    * this trains them). Exactness discipline (the [[graft.queries
    * .GraphOps.integerPagerank]] device applied to geometry): points
    * quantize once to non-negative BIGINTs q = floor(x·10⁶) + 4·10⁶
    * (the +4·10⁶ offset keeps every sum positive so integer division
    * is floor division in BOTH engines — Spark's DIV truncates toward
    * zero, DuckDB's // floors, and they only agree on non-negatives;
    * the offset passes through the mean exactly and cancels in every
    * distance difference), distances are exact 64-bit integers
    * (≤ 64·(8·10⁶)² < 2⁶²), argmin ties break to the smaller cid, and
    * each round's centroid is the FLOORED per-dimension mean — an
    * integer-lattice Lloyd step whose ≤1-lattice-unit (10⁻⁶)
    * quantization keeps every subsequent comparison exact instead of
    * accumulating engine-ordered double error. Seeds are the k
    * smallest vec_ids (deterministic, re-run stable).
    *
    * Plan shape per round: the k×64 centroid table BROADCASTs into a
    * zip_with/aggregate fold (map-side distances, no corpus shuffle —
    * the [[vecClusterAssign]] argument), one argmin aggregate, one
    * (cid, pos) sum — so a round is two map-side-combinable exchanges
    * of O(corpus) and O(k·64) rows, never an all-pairs join; rounds
    * chain lazily (each centroid subplan is referenced exactly once,
    * so the 3-round plan replays 3 corpus scans, not 4^rounds).
    * Emits (cid, n_points, pos, centroid) with centroid de-quantized
    * by one exact integer subtraction and one double division.
    */
  /** Quantize embeddings to the non-negative integer lattice
    * q = floor(x·10⁶) + 4·10⁶ — see [[vecKmeansLloyd]] for why the
    * offset makes floor division engine-agnostic.
    */
  private[queries] def kmeansQuantize(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1e6).cast("long") + lit(4000000L))
        .as("q"))

  /** Deterministic seeds: the k smallest vec_ids, cids 0..k−1. */
  private[queries] def kmeansSeeds(quant: DataFrame, k: Int): DataFrame =
    quant.orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("q"))
      .withColumn("cid",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("vec_id")) - 1).cast("long"))
      .select(col("cid"), col("q").as("cvec"))

  /** One Lloyd assign: broadcast the k×64 centroids into a map-side
    * distance fold, argmin ties to the smaller cid.
    */
  private[queries] def kmeansAssign(quant: DataFrame, cent: DataFrame): DataFrame =
    quant.join(broadcast(cent.select(col("cid"), col("cvec"))))
      .select(col("vec_id"), col("cid"), col("q"),
        aggregate(
          zip_with(col("q"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d2"))
      .groupBy("vec_id")
      // (d2, cid) is unique per group, so the trailing q never
      // participates in the struct ordering — it just rides along
      .agg(min(struct(col("d2"), col("cid"), col("q"))).as("m"))
      .select(col("m.cid").as("cid"), col("m.q").as("q"))

  /** One Lloyd update: floored per-dimension integer mean per cid.
    * Empty clusters vanish (no row), the classic Lloyd convention.
    */
  private[queries] def kmeansUpdate(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("q")))
      .groupBy("cid", "pos")
      .agg(sum("col").as("s"), count(lit(1)).as("n"))
      .groupBy("cid")
      .agg(max("n").as("n"), array_sort(collect_list(
        struct(col("pos"), expr("s DIV n").as("c")))).as("ps"))
      .select(col("cid"), col("n"),
        transform(col("ps"), p => p.getField("c")).as("cvec"))

  /** Fixed-rounds Lloyd on the integer lattice: the statically-unrolled
    * lazy chain [[vecKmeansLloyd]] declares (rounds=3) and the
    * fixed-depth reference the [[kmeansToFixpoint]] spec replays at the
    * converged run's depth. Returns quantized (cid, n, cvec).
    */
  def kmeansCentroids(embeddings: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val quant = kmeansQuantize(embeddings)
    var cent = kmeansSeeds(quant, k)
    for (_ <- 1 to rounds)
      cent = kmeansUpdate(kmeansAssign(quant, cent))
        .select(col("cid"), col("n"), col("cvec"))
    cent
  }

  def vecKmeansLloyd(spark: SparkSession, sfDir: String): DataFrame =
    kmeansCentroids(Tables(spark, sfDir).embeddings, k = 8, rounds = 3)
      .select(col("cid"), col("n").as("n_points"), posexplode(col("cvec")))
      .select(col("cid"), col("n_points"), (col("pos") + 1).as("pos"),
        ((col("col") - 4000000L).cast("double") / 1e6).as("centroid"))
      .orderByOnce("cid", "pos")

  /** Lloyd UNTIL CONVERGENCE — the per-round-action driver discipline of
    * [[graft.queries.GraphOps.integerPagerankConverged]] applied to the
    * k-means fit. [[vecKmeansLloyd]] chains a fixed 3 rounds lazily (one
    * declared, hash-checkable plan); a real fit runs until the centroids
    * stop moving, which needs a per-round materialization + compare —
    * this driver:
    *
    *  - the quantized corpus is checkpointed ONCE up front (every round
    *    re-reading the raw embedding scan would replay the quantize
    *    projection per action — cheap here, not at 100 TB where the scan
    *    is the cost);
    *  - each round's k×64 centroid table is checkpointed (lineage
    *    truncation: round N must not replay rounds 1..N−1's corpus
    *    passes) and the previous round's blocks released immediately;
    *  - convergence = EXACT integer L1 centroid movement ≤
    *    `toleranceUnits` (lattice units of 10⁻⁶), computed over one
    *    full-outer cid join of consecutive rounds' k-row tables — a
    *    vanished or newborn cluster counts as movement (not converged)
    *    rather than folding an arbitrary mass into the sum. Per-dim
    *    |Δ| ≤ 8·10⁶ and k·64 terms keep the LONG sum exact. Floored
    *    integer means CAN settle into a ±1-unit orbit on adversarial
    *    data, so toleranceUnits = 0 means "literal fixpoint or
    *    maxRounds" — same contract as pagerank's tolerance.
    *
    * Returns (quantized centroid frame (cid, n, cvec), rounds executed,
    * converged). The frame is the one pinned checkpoint — the CALLER
    * releases it ([[org.apache.spark.sql.graft.Checkpoints.release]]).
    * Capped at `maxRounds` with converged = false (a bounded-rounds
    * centroid table is still a defined Lloyd output).
    */
  def kmeansToFixpoint(embeddings: DataFrame, k: Int = 8,
      maxRounds: Int = 25, toleranceUnits: Long = 0L,
      checkpointDir: Option[String] = None): (DataFrame, Int, Boolean) = {
    import org.apache.spark.sql.graft.Checkpoints
    require(maxRounds >= 1)
    val sc = embeddings.sparkSession.sparkContext
    val prevCkptDir = Checkpoints.checkpointDirOf(sc)
    checkpointDir.foreach(sc.setCheckpointDir)
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) {
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val out = df.checkpoint(eager = true)
          df.unpersist(blocking = false)
          out
        } catch {
          case t: Throwable => df.unpersist(blocking = false); throw t
        }
      } else df.localCheckpoint()
    // exact integer centroid movement between consecutive rounds: k-row
    // frames, so this action is broadcast-join cheap. A cid present on
    // only one side (cluster vanished/split back) is movement by fiat.
    def moved(next: DataFrame, prev: DataFrame): Boolean = {
      val r = next.select(col("cid"), col("cvec").as("nv"))
        .join(prev.select(col("cid"), col("cvec").as("pv")), Seq("cid"), "full_outer")
        .agg(
          sum(when(col("nv").isNull || col("pv").isNull, 1L).otherwise(0L)),
          sum(when(col("nv").isNotNull && col("pv").isNotNull,
            aggregate(zip_with(col("nv"), col("pv"), (a, b) => abs(a - b)),
              lit(0L), (acc, x) => acc + x)).otherwise(0L)))
        .head()
      r.getLong(0) > 0L || r.getLong(1) > toleranceUnits
    }
    def body(): (DataFrame, Int, Boolean) = {
      val quant = snap(kmeansQuantize(embeddings))
      var cent = snap(kmeansSeeds(quant, k))
      var it = 0
      var converged = false
      try {
        while (!converged && it < maxRounds) {
          val next = snap(kmeansUpdate(kmeansAssign(quant, cent))
            .select(col("cid"), col("n"), col("cvec")))
          try converged = !moved(next, cent)
          catch { case t: Throwable => Checkpoints.release(next); throw t }
          val prev = cent
          cent = next
          Checkpoints.release(prev)
          it += 1
        }
      } catch {
        case t: Throwable => Checkpoints.release(cent); throw t
      } finally Checkpoints.release(quant)
      (cent, it, converged)
    }
    try body() finally
      if (checkpointDir.isDefined)
        Checkpoints.restoreCheckpointDir(sc, prevCkptDir)
  }

  val vecKmeansLloydSql: String = {
    def round(prevC: String, a: String, c: String): String =
      s"""$a AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT d.vec_id, d.cid,
         |      row_number() OVER (PARTITION BY d.vec_id ORDER BY d.d2, d.cid) AS rn
         |    FROM (
         |      SELECT p.vec_id, c.cid, sum((p.q - c.c) * (p.q - c.c)) AS d2
         |      FROM pts p JOIN $prevC c USING (pos)
         |      GROUP BY 1, 2) d)
         |  WHERE rn = 1),
         |$c AS MATERIALIZED (
         |  SELECT a.cid, p.pos, sum(p.q) // count(*) AS c, count(*) AS n
         |  FROM $a a JOIN pts p USING (vec_id)
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH pts AS MATERIALIZED (
       |  SELECT vec_id, pos,
       |    CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1e6) AS BIGINT) + 4000000 AS q
       |  FROM embeddings, generate_series(1, 64) AS t(pos)),
       |seeds AS MATERIALIZED (
       |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
       |c0 AS MATERIALIZED (
       |  SELECT s.cid, p.pos, p.q AS c FROM seeds s JOIN pts p USING (vec_id)),
       |${round("c0", "a1", "c1")},
       |${round("c1", "a2", "c2")},
       |${round("c2", "a3", "c3")}
       |SELECT cid, n AS n_points, pos,
       |  CAST(c - 4000000 AS DOUBLE) / 1e6 AS centroid
       |FROM c3 ORDER BY cid, pos""".stripMargin
  }

  /** Hybrid retrieval by Reciprocal-Rank Fusion (Cormack, Clarke &
    * Büttcher 2009) — the standard RAG re-ranker: a lexical BM25 top-20
    * (the [[graft.queries.TrainPrep.textBm25Topk]] scoring, documents
    * table) and a semantic cosine top-20 (query vector = doc 0's
    * embedding, the exact scaled-integer dot kernel) fuse by
    * `Σ 1/(60 + rank)`, so a document strong in EITHER list surfaces
    * without score calibration between the two retrievers.
    *
    * Scale shape: each retriever ends in TakeOrdered top-20 — the
    * corpus is never globally sorted and never joined to the other
    * modality; the fusion join and rank windows run on 20-row frames.
    * Ranks are ints and the RRF sum is two IEEE divisions in a fixed
    * order, identical in both engines; missing-from-a-list ranks sit
    * at 0 (contribution 0) rather than NULL so the output stays
    * integer-typed. doc_id 0 (the query document itself) is excluded
    * from both sides.
    */
  def ragFusionRrf(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val t = Tables(spark, sfDir)
    // lexical arm: BM25 over the fixed 3-term query, full-corpus stats
    val terms = Seq("vector", "hash", "window")
    val tok = t.documents.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    val tfCols = terms.zipWithIndex.map { case (tm, i) =>
      sum(when(col("w") === tm, 1L).otherwise(0L)).as(s"tf$i") }
    val per = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val dfCols = terms.indices.map { i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i") }
    val stats = per.agg(count(lit(1)).as("nd"),
      (sum(col("dl")).as("sdl") +: dfCols): _*)
    val lenNorm = lit(1.2) * (lit(0.25) + lit(0.75) *
      ((col("dl") * col("nd")).cast("double") / col("sdl").cast("double")))
    def contrib(i: Int) = {
      val tf = col(s"tf$i").cast("double")
      val idf = ((col("nd") - col(s"df$i")).cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5))
      idf * (tf * lit(2.2) / (tf + lenNorm))
    }
    val lex20 = per.crossJoin(broadcast(stats))
      .filter(col("doc_id") =!= 0)
      .select(col("doc_id"),
        round(contrib(0) + contrib(1) + contrib(2), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast("long").as("r_lex"))
    // semantic arm: exact cosine top-20 against the doc-0 query vector
    val e = t.embeddings
    val sem20 = Ann.bruteForceTopK(
        e.filter(col("vec_id") =!= 0), e.filter(col("vec_id") === 0),
        "embedding", "vec_id", 20)
      .select(col("vec_id").as("doc_id"), row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id"))).cast("long").as("r_sem"))
    lex20.join(sem20, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("r_lex"), lit(0L)).as("r_lex"),
        coalesce(col("r_sem"), lit(0L)).as("r_sem"))
      .withColumn("rrf", round(
        when(col("r_lex") > 0, lit(1.0) / (lit(60L) + col("r_lex"))).otherwise(lit(0.0)) +
        when(col("r_sem") > 0, lit(1.0) / (lit(60L) + col("r_sem"))).otherwise(lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(15)
  }

  val ragFusionRrfSql: String = {
    def c(i: Int) =
      s"((CAST(nd - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))" +
        s" * (CAST(tf$i AS DOUBLE) * 2.2 / (CAST(tf$i AS DOUBLE)" +
        " + 1.2 * (0.25 + 0.75 * (CAST(dl * nd AS DOUBLE) / CAST(sdl AS DOUBLE)))))"
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), w -> len(w) > 0)) AS w
       |  FROM documents),
       |per AS (
       |  SELECT doc_id, count(*) AS dl,
       |    CAST(sum(CASE WHEN w = 'vector' THEN 1 ELSE 0 END) AS BIGINT) AS tf0,
       |    CAST(sum(CASE WHEN w = 'hash' THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
       |    CAST(sum(CASE WHEN w = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf2
       |  FROM toks GROUP BY 1),
       |st AS (
       |  SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS sdl,
       |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
       |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
       |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
       |  FROM per),
       |lex20 AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex
       |  FROM (SELECT doc_id, round(${c(0)} + ${c(1)} + ${c(2)}, 6) AS score
       |        FROM per CROSS JOIN st WHERE doc_id <> 0
       |        ORDER BY score DESC, doc_id LIMIT 20)),
       |q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
       |dots AS (
       |  SELECT v.vec_id, ${dotsSql("v.embedding", "q.e")}
       |  FROM embeddings v, q, generate_series(1, 64) AS t(pos)
       |  WHERE v.vec_id <> 0
       |  GROUP BY v.vec_id),
       |sem20 AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r_sem
       |  FROM (SELECT vec_id AS doc_id, round($cosSql, 6) AS cos
       |        FROM dots ORDER BY cos DESC, vec_id LIMIT 20))
       |SELECT doc_id,
       |  coalesce(r_lex, 0) AS r_lex,
       |  coalesce(r_sem, 0) AS r_sem,
       |  round((CASE WHEN coalesce(r_lex, 0) > 0 THEN 1.0 / (60 + r_lex) ELSE 0.0 END)
       |      + (CASE WHEN coalesce(r_sem, 0) > 0 THEN 1.0 / (60 + r_sem) ELSE 0.0 END), 6) AS rrf
       |FROM lex20 FULL JOIN sem20 USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT 15""".stripMargin
  }
}
