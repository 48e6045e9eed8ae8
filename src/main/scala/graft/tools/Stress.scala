package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, NearDup}

/** Scale-stress harness: replicates the sf0.1 fixtures N× (distinct ids,
  * perturbed content so replicas are not trivial exact dups) and runs
  * the heaviest operator families — the ones whose cost is super-linear
  * if the blocking/prefix design is wrong. The point is not a pretty
  * number; it is catching candidate-set explosions, skew, and memory
  * blowups at a multiple of the bench corpus BEFORE a real cluster does.
  *
  *   runMain graft.tools.Stress [replicas] [sfDir] [docs|ann|all|fam,fam…]
  *
  * The third arg also accepts a comma-list of family labels (e.g.
  * "ngram_jaccard,ngram_jaccard_bcast" or "connected_components") so a
  * measurement session can repeat ONE family without paying for the
  * rest. STRESS_CKPT_DIR=<dir> switches connected_components from
  * localCheckpoint to the reliable-checkpoint path (the executor-loss-
  * tolerant 100 TB mode) for checkpoint-mode A/B runs.
  *
  * Prints per-family wall time and output sizes, then ONE JSON summary
  * line (`{"stress":replicas,"times":{...},"counts":{...},"pinned":p}`)
  * so a scaling table across runs (see STRESS.md) can be assembled from
  * the records alone. ANN families time index BUILD and PROBE
  * separately — the scaling claim is build ~linear / probe ~flat — and
  * the disk-backed probe reads a `partitionBy("__cell")` index so the
  * probe's cell list becomes partition pruning, the 100 TB layout.
  * Index width scales with the corpus (nCentroids ∝ replicas, nPlanes +
  * log2(replicas)), as a real deployment sizes it: probe cost is
  * nProbe × CELL size, so cells must stay bounded as the corpus grows —
  * with a FIXED index a probe is a fixed fraction of the corpus and
  * scales linearly, which is the wrong layout at 100 TB, not a slow
  * operator. Exits non-zero if any family fails or pins an RDD at exit.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.flatMap(_.toIntOption).getOrElse(8)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(2).getOrElse("all")
    val docFams = Set("ngram_jaccard", "ngram_jaccard_bcast",
      "ngram_jaccard_sharded", "ngram_jaccard_indexed", "minhash_lsh",
      "simhash", "clean_pipeline", "connected_components", "containment",
      "token_corpus_write", "tokenfreq_retokenize", "tokenfreq_table",
      "tfidf_retokenize", "tfidf_table", "quality_retokenize",
      "quality_table", "token_corpus_appends", "tfidf_table_fragmented",
      "token_corpus_compact", "tfidf_table_compacted",
      "bpe_kernel_24", "bpe_kernel_512", "bpe_kernel_4k",
      "bpe_chain_24", "bpe_chain_96")
    val annFams = Set("ivf_build", "ivf_probe", "ivf_write_index",
      "ivf_probe_disk", "lsh_build", "lsh_probe", "brute_force_batch32",
      "pq_build", "pq_probe", "ivf_appends", "ivf_probe_fragmented",
      "ivf_compact", "ivf_probe_compacted")
    val joinFams = Set("range_join", "interval_overlap", "fuzzy_join",
      "fuzzy_join_short", "pagerank", "triangles", "snapshot_diff",
      "bfs", "neighbor_jaccard", "fuzzy_jaro", "fuzzy_jaro_vocab",
      "fuzzy_jaro_vocab_alltok", "span_dedup", "span_dedup_fp",
      "cdc_apply", "cdc_apply_deep", "view_delta", "view_recompute",
      "upsert_layout_full", "upsert_layout_log",
      "rollminmax_win_20", "rollminmax_win_64", "rollminmax_win_512",
      "rollminmax_deq_20", "rollminmax_deq_64", "rollminmax_deq_512",
      "asof_join", "kcore", "ra_hub_uncapped", "ra_hub_capped",
      "pit_multi_k2", "pit_multi_k4", "pit_multi_k8",
      "pit_chained_k2", "pit_chained_k4", "pit_chained_k8",
      "agg_refresh_base", "agg_refresh", "agg_rebuild",
      "bucketed_facts_write", "bucketed_facts_join", "plain_facts_join")
    // probe families need their index; disk probe needs the written index
    val prereq = Map("ivf_probe" -> "ivf_build", "ivf_write_index" -> "ivf_build",
      "ivf_probe_disk" -> "ivf_write_index", "lsh_probe" -> "lsh_build",
      "pq_probe" -> "pq_build", "agg_refresh" -> "agg_refresh_base",
      "bucketed_facts_join" -> "bucketed_facts_write",
      "tokenfreq_table" -> "token_corpus_write",
      "tfidf_table" -> "token_corpus_write",
      "quality_table" -> "token_corpus_write",
      "token_corpus_appends" -> "token_corpus_write",
      "tfidf_table_fragmented" -> "token_corpus_appends",
      "token_corpus_compact" -> "tfidf_table_fragmented",
      "tfidf_table_compacted" -> "token_corpus_compact",
      "upsert_layout_log" -> "upsert_layout_full",
      "ivf_appends" -> "ivf_probe_disk",
      "ivf_probe_fragmented" -> "ivf_appends",
      "ivf_compact" -> "ivf_probe_fragmented",
      "ivf_probe_compacted" -> "ivf_compact")
    val famOnly: Set[String] =
      if (Set("all", "docs", "ann", "joins")(mode)) Set.empty
      else {
        var s = mode.split(",").toSet
        val unknown = s.diff(docFams ++ annFams ++ joinFams)
        require(unknown.isEmpty,
          s"unknown stress families: ${unknown.mkString(", ")} " +
            s"(valid: ${(docFams ++ annFams ++ joinFams).toSeq.sorted.mkString(", ")})")
        var grew = true
        while (grew) { val n = s ++ s.flatMap(prereq.get); grew = n != s; s = n }
        s
      }
    val famFilter: String => Boolean =
      label => famOnly.isEmpty || famOnly(label)
    val runDocs = mode == "all" || mode == "docs" || famOnly.exists(docFams)
    val runAnn = mode == "all" || mode == "ann" || famOnly.exists(annFams)
    val runJoins = mode == "all" || mode == "joins" || famOnly.exists(joinFams)
    val ckptDir = sys.env.get("STRESS_CKPT_DIR")
    // bounded cells/buckets as the corpus grows (the 100 TB layout):
    // cell size ≈ corpus/nCentroids stays ~constant, so probe cost does
    val nCentroids = math.max(16, math.min(512, 16 * replicas))
    val nPlanes = math.min(16, 6 + (31 - Integer.numberOfLeadingZeros(math.max(1, replicas))))
    val spark = SparkSession.builder().master("local[32]")
      // Shuffle width is NOT hand-tuned per scale: AQE starts every
      // shuffle at 1024 partitions and coalesces down to the advisory
      // size (64 MB), so partitions stay memory-sized as the corpus
      // grows — at 64× the dedup shuffles carry 10M+ pairs with gram
      // sets and a fixed width of 64 spills (measured 406 s vs the
      // coalesced plan; see STRESS.md). This is the 100 TB setting:
      // size initialPartitionNum for the largest shuffle and let AQE
      // shrink the small ones.
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.ui.enabled", "false")
      // STRESS_EVENTLOG_DIR=<dir>: write the Spark event log for
      // stage-level forensics (task counts, shuffle bytes, spill) —
      // measurement sessions only; off by default
      .config("spark.eventLog.enabled",
        sys.env.contains("STRESS_EVENTLOG_DIR").toString)
      .config("spark.eventLog.dir",
        sys.env.getOrElse("STRESS_EVENTLOG_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // STRESS_HEAP_WATCH=1: measurement-session memory forensics — a
    // 200 ms poller records the JVM heap PEAK and which stages were
    // live when it happened (stage names carry the callsite), plus the
    // top task-level peakExecutionMemory per stage. This is how a
    // "family X needed a 24g driver at N×" observation gets a NAMED
    // owner instead of a guess.
    if (sys.env.contains("STRESS_HEAP_WATCH")) {
      val mem = java.lang.management.ManagementFactory.getMemoryMXBean
      val active = java.util.concurrent.ConcurrentHashMap
        .newKeySet[String]()
      val stagePeakExec = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      @volatile var peakHeap = 0L
      @volatile var peakLive = ""
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageSubmitted(
              s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
            active.add(s"${s.stageInfo.stageId}:${s.stageInfo.name}")
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            active.remove(s"${s.stageInfo.stageId}:${s.stageInfo.name}")
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (t.taskMetrics != null)
              stagePeakExec.merge(s"${t.stageId}", t.taskMetrics.peakExecutionMemory,
                (a, b) => math.max(a, b))
        })
      val poller = new Thread(() => {
        while (true) {
          val used = mem.getHeapMemoryUsage.getUsed
          if (used > peakHeap) {
            peakHeap = used
            peakLive = active.toArray.mkString(" | ")
          }
          Thread.sleep(200)
        }
      }, "stress-heap-watch")
      poller.setDaemon(true)
      poller.start()
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        println(f"[heapwatch] peak heap ${peakHeap / 1e9}%.2f GB during: $peakLive")
        val top = stagePeakExec.entrySet().toArray
          .map(_.asInstanceOf[java.util.Map.Entry[String, Long]])
          .sortBy(-_.getValue).take(5)
        top.foreach(e => println(
          f"[heapwatch] stage ${e.getKey}%s max task peakExecutionMemory ${e.getValue / 1e9}%.2f GB"))
      }))
    }

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      times(label) = secs
      println(f"[stress] $label%-30s $secs%8.2f s"); r
    }
    var failed = 0
    def family(label: String)(f: => Long): Unit =
      if (famFilter(label)) try {
        val n = time(label)(f)
        counts(label) = n
        println(s"[stress]   $label rows: $n")
      } catch { case e: Throwable =>
        failed += 1; println(s"[stress] $label FAILED: $e")
      }

    // documents ×N: replica k shifts ids by k*10M and rotates each text
    // by k words so near-dup structure stays realistic (each replica
    // still contains the fixture's internal near-dups, but replicas are
    // not wholesale near-dups of each other at high k)
    if (runDocs) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), lower(col("text")).as("text"))
      val corpus = (0 until replicas).map { k =>
        docs.select((col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          concat_ws(" ",
            slice(split(col("text"), "\\s+"), k + 1, 1000000),
            slice(split(col("text"), "\\s+"), 1, k)).as("text"))
      }.reduce(_ unionByName _)
      val nDocs = time(s"corpus build")(corpus.count())
      println(s"[stress] corpus: $nDocs docs")
      counts("corpus_docs") = nDocs

      family("ngram_jaccard") {
        NearDup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.8).count()
      }
      // sharded-regime PPJoin, FORCED (broadcast budget 0): the honest
      // measurement of the corpus-outgrows-executor-memory path — at
      // stress scales the default regime switch picks broadcast, so
      // without the override the sharded plan's scaling would go
      // unmeasured. Counts must equal the default path's.
      family("ngram_jaccard_sharded") {
        spark.conf.set(NearDup.BroadcastPrefixBytesConf, "0")
        try NearDup.ngramJaccardPairs(corpus, "doc_id", "text",
          threshold = 0.8).count()
        finally spark.conf.unset(NearDup.BroadcastPrefixBytesConf)
      }
      // broadcast-verify variant: in the pairs >> docs regime the
      // doc->hash-set table is corpus-linear (~hundreds of MB at 64×)
      // while the pair-join payload is ~30 GB — broadcasting the table
      // turns both verify joins into map-side lookups so only skinny
      // (a, b) pairs shuffle. Counts must equal the shuffle path's.
      family("ngram_jaccard_bcast") {
        NearDup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.8,
          verifyBroadcast = true).count()
      }
      // broadcast-index PPJoin: candidate orientations never exist as
      // rows — the 64× candidate-shuffle cliff is designed out for the
      // pairs >> docs regime (index must fit executors; it is corpus-
      // linear). Counts must equal the shuffle path's.
      family("ngram_jaccard_indexed") {
        NearDup.ngramJaccardPairsIndexed(corpus, "doc_id", "text",
          threshold = 0.8).count()
      }
      // directed containment at t=0.9: the a-prefix (≈0.1·|A| rarest
      // grams) joins the FULL b postings — candidate mass is
      // Σ df_prefix(g)·df_full(g), which stays linear-ish only because
      // the rarity order keeps stopword grams out of every prefix
      family("containment") {
        NearDup.ngramContainmentPairs(corpus, "doc_id", "text",
          threshold = 0.9).count()
      }
      family("minhash_lsh") {
        NearDup.minHashLshPairs(corpus, "doc_id", "text", threshold = 0.8).count()
      }
      family("simhash") {
        NearDup.simHashPairs(corpus, "doc_id", "text", maxHamming = 2).count()
      }
      // round-6 cleaning pipeline over the replicated corpus: codegen
      // langid/quality kernels + one dedup shuffle — the cost must stay
      // ~linear in docs (any super-linearity here means an expression
      // fell out of codegen or a gate got pushed into the scan)
      family("clean_pipeline") {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.TextFunctions._
        val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
        corpus.select(col("doc_id"), col("text"),
            size(tokens(col("text"))).as("n_tokens"),
            round(qualityScore(col("text")), 4).as("quality"),
            langMarkerHits(col("text")).as("__h"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1 && col("quality") >= 0.5)
          .withColumn("predicted_lang", langIdFromHits(col("__h")))
          .filter(col("predicted_lang") =!= "und")
          .count()
      }
      // tokenize-once layout A/B (r14 verdict #3): materialize the
      // per-doc term-frequency table (doc_id, tok, tf, dl) ONCE,
      // bucketed+sorted by tok, and re-run the explode-into-shuffle
      // text consumers against it vs re-tokenizing the raw corpus.
      //   token_corpus_write — the one-time layout cost (tokenize +
      //     per-(doc,tok) collapse + bucketed write), linear by nature;
      //   tokenfreq_* — corpus vocabulary counts: the re-tokenize arm
      //     shuffles TOKEN INSTANCES into its aggregate, the table arm
      //     sums stored tf over co-located buckets (claim: ~zero
      //     exchange records);
      //   tfidf_* — per-(doc,tok) tf·idf: re-tokenize pays the
      //     (doc,tok) collapse AND the df aggregate AND a tok join; the
      //     table arm's tf is stored and its df join is co-located
      //     (claim: shuffle mass collapses to the df rows);
      //   quality_* — the CONTROL: a zero-shuffle codegen projection
      //     (token/char ratios) that must NOT be moved to the table —
      //     the table read pays parquet decode of the exploded rows vs
      //     one streaming regex pass over raw text (the r14 advice's
      //     "measure first" caveat, made a recorded number).
      // ShuffleStats records exchange volume alongside wall: local wall
      // misprices shuffles, and the layout argument is the VOLUME.
      def tokStats(label: String, ds: org.apache.spark.sql.DataFrame): Long = {
        val st = org.apache.spark.sql.graft.ShuffleStats.of(ds)
        println(s"[stress]   $label shuffle: ${st.exchanges} exchanges, " +
          s"${st.records} records, ${st.bytes} bytes")
        counts(s"${label}_shuffle_records") = st.records
        counts(s"${label}_shuffle_bytes") = st.bytes
        ds.count()
      }
      val tokTable = s"stress_token_corpus_$replicas"
      family("token_corpus_write") {
        import graft.functions.TextFunctions.tokens
        val tf = corpus
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
          .withColumn("dl", sum("tf").over(
            org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
        graft.operators.Bucketing.writeBucketed(tf, tokTable, "tok", 64)
        spark.table(tokTable).count()
      }
      family("tokenfreq_retokenize") {
        import graft.functions.TextFunctions.tokens
        tokStats("tokenfreq_retokenize",
          corpus.select(explode(tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("n")))
      }
      family("tokenfreq_table") {
        tokStats("tokenfreq_table",
          spark.table(tokTable).groupBy("tok").agg(sum("tf").as("n")))
      }
      family("tfidf_retokenize") {
        import graft.functions.TextFunctions.tokens
        val inst = corpus
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val tf = inst.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val df = inst.select("doc_id", "tok").distinct()
          .groupBy("tok").agg(count(lit(1)).as("df"))
        tokStats("tfidf_retokenize",
          tf.join(df, "tok").select(col("doc_id"), col("tok"),
            (col("tf") * log(lit(nDocs.toDouble) / col("df"))).as("tfidf")))
      }
      family("tfidf_table") {
        val t = spark.table(tokTable)
        val df = t.groupBy("tok").agg(count(lit(1)).as("df"))
        tokStats("tfidf_table",
          t.join(df, "tok").select(col("doc_id"), col("tok"),
            (col("tf") * log(lit(nDocs.toDouble) / col("df"))).as("tfidf")))
      }
      family("quality_retokenize") {
        import graft.functions.TextFunctions._
        corpus.select(col("doc_id"),
          size(tokens(col("text"))).as("n_tokens"),
          round(qualityScore(col("text")), 4).as("quality")).count()
      }
      family("quality_table") {
        // the table can only answer the token-count part of quality —
        // and even that by re-aggregating exploded rows; the char-level
        // ratios would need the raw text anyway. Measure the honest
        // fragment: per-doc token totals from the table.
        spark.table(tokTable).groupBy("doc_id")
          .agg(max("dl").as("n_tokens")).count()
      }
      // r17 compaction A/B — the small-file penalty the maintenance op
      // removes, as a recorded number: 32 nightly appends fragment the
      // token table (files/bucket = 33 where every sliver touched every
      // bucket), the SAME tf·idf consumer runs over the fragmented
      // layout, Bucketing.compact rewrites it to one file per bucket,
      // and the consumer runs again over IDENTICAL rows. The fragmented
      // and compacted arms differ ONLY in file count, so their wall
      // ratio is the per-file open/footer overhead plus the forfeited
      // bucket-sort trust — the cost curve that, untreated, grows one
      // file per bucket per ingest night forever.
      def tfidfOverTable(label: String): Long = {
        val t = spark.table(tokTable)
        val df = t.groupBy("tok").agg(count(lit(1)).as("df"))
        tokStats(label,
          t.join(df, "tok").select(col("doc_id"), col("tok"),
            (col("tf") * log(lit(nDocs.toDouble) / col("df"))).as("tfidf")))
      }
      val appendsK = 32
      family("token_corpus_appends") {
        (0 until appendsK).foreach { k =>
          graft.tables.TokenCorpus.append(spark, tokTable,
            corpus.filter(pmod(col("doc_id"), lit(appendsK)) === k)
              // 1e11 clears any replica shift (k*1e7, k <= a few
              // hundred) — 1e9 collided with replica 100's ids
              .select((col("doc_id") + lit(100000000000L)).as("doc_id"),
                col("text")))
        }
        val fpb = graft.operators.Bucketing.filesPerBucket(spark, tokTable)
        counts("fragmented_files_per_bucket") = fpb.values.max.toLong
        println(s"[stress]   files/bucket after $appendsK appends: " +
          s"max=${fpb.values.max}")
        spark.table(tokTable).count()
      }
      family("tfidf_table_fragmented") {
        tfidfOverTable("tfidf_table_fragmented")
      }
      family("token_corpus_compact") {
        graft.operators.Bucketing.compact(spark, tokTable)
        val fpb = graft.operators.Bucketing.filesPerBucket(spark, tokTable)
        counts("compacted_files_per_bucket") = fpb.values.max.toLong
        spark.table(tokTable).count()
      }
      family("tfidf_table_compacted") {
        tfidfOverTable("tfidf_table_compacted")
      }
      // r18 BPE encode-cost curve (r17 verdict #1): the priority-merge
      // kernel's per-word cost must stay FLAT as the merge table grows
      // 24 → 512 → 4096 (rank lookups are hash probes — a pair not in
      // the word costs nothing), while the replace CHAIN pays
      // 2·|merges| full string passes per word whether or not a merge
      // fires — measured at 24 and 96 (its 4× point; past ~a few
      // hundred merges the chain's Column fold is unbuildable, which is
      // itself the finding). All arms encode the same distinct-word
      // frame — the declared queries' encode-once-per-word shape — so
      // wall ratios are per-word cost ratios. Tables above 24 are
      // TRAINED from the corpus vocabulary (Bpe.trainVocab, weighted by
      // occurrence count), outside the timed region: a real deployment
      // loads its table, it does not train per query.
      val bpeFams = Seq("bpe_kernel_24", "bpe_kernel_512", "bpe_kernel_4k",
        "bpe_chain_24", "bpe_chain_96")
      if (bpeFams.exists(famFilter)) {
        import graft.functions.Bpe
        // the template fixture's vocabulary is ~31 distinct words —
        // useless for a per-word cost curve — so the arm measures over a
        // SYNTHETIC vocabulary: 12.5k×replicas deterministic sha-derived
        // [a-f] words of length 5–15 (a 6-char alphabet reuses pairs
        // densely, so deep merge tables genuinely fire), plus the
        // fixture's real words. Encode-once-per-distinct-word is the
        // declared queries' plan shape, so per-word cost IS the number.
        val vocabDf = spark.range(12500L * replicas)
          .select(substring(concat(
              regexp_replace(sha2(col("id").cast("string"), 256), "[0-9]", ""),
              regexp_replace(sha2(concat(col("id").cast("string"), lit("x")), 256), "[0-9]", "")),
            1, 15).as("full"),
            (pmod(col("id"), lit(11L)) + 5L).cast("int").as("n"))
          .select(expr("substring(full, 1, n)").as("w"))
          .unionByName(corpus
            .select(explode(split(regexp_replace(col("text"), "[^a-z]+", " "), " ")).as("w"))
            .filter(length(col("w")) > 0))
          .groupBy("w").agg(count(lit(1)).as("cnt")).persist()
        val nWords = vocabDf.count()
        println(s"[stress] bpe vocab: $nWords distinct words")
        val trainIn = vocabDf.orderBy(col("cnt").desc, col("w")).limit(8000)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        val t0 = System.nanoTime()
        val m4k = Bpe.trainVocab(trainIn, 4096)
        val m512 = m4k.take(512)
        // the chain arms need SELF-PAIR-FREE tables (encodeChain
        // refuses l == r — the replace phrasing mis-pairs runs; the
        // kernel arms take the raw prefixes, self-pairs included), so
        // they train chain-expressible tables of the wanted depth
        val m96 = Bpe.trainVocab(trainIn, 96, allowSelfPairs = false)
        println(f"[stress] bpe trainVocab(4096): ${(System.nanoTime() - t0) / 1e9}%.1f s " +
          s"(${m4k.length} merges; 512 table is its prefix; the chain-96 " +
          "table is a chain-expressible (no-self-pair) training; " +
          "chain-24 is the shipped default table)")
        def encAll(c: org.apache.spark.sql.Column): Long = {
          // sum of encoded lengths forces every encode and defeats
          // whole-column pruning; rows = vocabulary size
          vocabDf.select(sum(length(c))).collect()
          nWords
        }
        family("bpe_kernel_24")(encAll(Bpe.encodeFast(col("w"))))
        family("bpe_kernel_512")(encAll(Bpe.encodeFast(col("w"), m512)))
        family("bpe_kernel_4k")(encAll(Bpe.encodeFast(col("w"), m4k)))
        family("bpe_chain_24")(encAll(Bpe.encode(col("w"))))
        family("bpe_chain_96")(encAll(Bpe.encodeChain(col("w"), m96)))
        vocabDf.unpersist()
      }
      // component resolution over the minhash pair graph — the
      // post-pair step of a real dedup pipeline. Star-contraction is
      // O(log n) rounds of equi-shuffles, so wall time must stay
      // ~linear in the pair count as replicas grow; the converged
      // assignment is the one pinned artifact and is released here.
      family("connected_components") {
        val pairs = NearDup.minHashLshPairs(corpus, "doc_id", "text", threshold = 0.8)
        val comp = graft.operators.ConnectedComponents.resolve(pairs, "a", "b",
          checkpointDir = ckptDir)
        val n = comp.count()
        org.apache.spark.sql.graft.Checkpoints.release(comp)
        n
      }
    }

    if (runJoins) {
      // events ×N: replica k shifts event ids and slides timestamps by
      // k months, so windows never pile on one instant — the per-window
      // match density stays constant and total matches scale ~linearly
      // with replicas (the honest shape: a 100 TB event stream is more
      // TIME, not denser seconds)
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"),
          // raw parquet reads give TIMESTAMP_NTZ (Tables normalizes,
          // Stress reads direct) — unix_micros needs TIMESTAMP
          unix_micros(col("ts").cast("timestamp")).as("pt"))
      val evr = (0 until replicas).map { k =>
        ev.select((col("event_id") + lit(k.toLong * 100000000L)).as("event_id"),
          col("event_type"), col("value"),
          (col("pt") + lit(k.toLong * 2678400000000L)).as("pt"))
      }.reduce(_ unionByName _)
      family("range_join") {
        val windows = evr
          .filter(col("event_type") === "error" && col("value") >= 200)
          .select(col("event_id").as("w_id"), col("pt").as("w_start"),
            (col("pt") + lit(600000000L)).as("w_end"))
        graft.operators.RangeJoin.pointInInterval(
          evr.select(col("event_id"), col("pt")), "pt",
          windows, "w_start", "w_end", bucketWidth = 600000000L).count()
      }
      // interval×interval sibling on the same replicated stream: error
      // windows × purchase windows. Same honest shape — replicas add
      // TIME, not density, so true overlap pairs scale ~linearly and
      // the claim is flat per-pair cost (both sides explode to a
      // bounded number of buckets; the canonical-bucket rule keeps the
      // equi-join output exactly the true pairs, no dedup stage to
      // go super-linear)
      family("interval_overlap") {
        val errs = evr
          .filter(col("event_type") === "error" && col("value") >= 200)
          .select(col("event_id").as("e_id"), col("pt").as("e_start"),
            (col("pt") + lit(600000000L)).as("e_end"))
        val purch = evr.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("pt").as("p_start"),
            (col("pt") + lit(300000000L)).as("p_end"))
        graft.operators.RangeJoin.intervalOverlap(
          errs, "e_start", "e_end", purch, "p_start", "p_end",
          bucketWidth = 600000000L).count()
      }
      // lineitem ×N with shifted order AND part keys -> N disjoint
      // copies of the parts-bought-together graph: true masses are
      // identical per copy (spec-pinned invariance), so the family's
      // claim is LINEAR wall time in edges with flat per-edge cost —
      // a superstep is one equi-join + aggregate and must stay that
      // way as the graph decuples
      family("pagerank") {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey"))
        val po = (0 until replicas).map { k =>
          li.select((col("l_orderkey") + lit(k.toLong * 1000000000L)).as("ok"),
            (col("l_partkey") + lit(k.toLong * 10000000L)).as("pk"))
        }.reduce(_ unionByName _).distinct()
        val edges = po.select(col("ok"), col("pk").as("src"))
          .join(po.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") =!= col("dst"))
          .select("src", "dst").distinct()
        val nodes = edges.select(col("src").as("id")).distinct()
        graft.queries.GraphOps.integerPagerank(nodes, edges, rounds = 3)
          .count()
      }
      // same disjoint-copy construction for triangle counting: per-copy
      // triangle sets are identical, so total triangles scale exactly
      // linearly in replicas; the claim is flat per-edge cost — the
      // degree orientation must keep the wedge intermediate bounded as
      // the co-purchase hubs replicate
      family("triangles") {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey"))
        val po = (0 until replicas).map { k =>
          li.select((col("l_orderkey") + lit(k.toLong * 1000000000L)).as("ok"),
            (col("l_partkey") + lit(k.toLong * 10000000L)).as("pk"))
        }.reduce(_ unionByName _).distinct()
        val edges = po.select(col("ok"), col("pk").as("u"))
          .join(po.select(col("ok"), col("pk").as("v")), "ok")
          .filter(col("u") < col("v"))
          .select("u", "v").distinct()
        // coalesce: sum over a triangle-free stress dataset is NULL,
        // and a diagnostics tool must report 0, not NPE
        graft.queries.GraphOps.triangleCounts(edges)
          .agg(coalesce(sum("tri_count"), lit(0L))).head().getLong(0) / 3
      }
      // planted-hub A/B for the RA wedge expansion (r15 verdict #1):
      // ONE node with degree 10⁴ on an otherwise-sparse ring. The
      // uncapped expansion must emit C(10⁴,2) ≈ 5·10⁷ wedges from that
      // single key (the power-law straggler the cap exists to bound);
      // the capped form is C(1024,2) ≈ 5.2·10⁵ from the same key —
      // ~95× less row volume out of one task, measured not argued.
      def plantedHub(hubDeg: Int) = {
        val spokes = spark.range(1, hubDeg + 1L).select(col("id"))
        val star = spokes.select(lit(0L).as("src"), col("id").as("dst"))
          .unionByName(spokes.select(col("id").as("src"), lit(0L).as("dst")))
        val ring = spokes
          .select(col("id").as("src"),
            (col("id") % lit(hubDeg.toLong) + lit(1L)).as("dst"))
        star.unionByName(ring)
          .unionByName(ring.select(col("dst").as("src"), col("src").as("dst")))
      }
      family("ra_hub_uncapped") {
        graft.queries.GraphOps
          .resourceAllocScores(plantedHub(10000), capC = Int.MaxValue).count()
      }
      family("ra_hub_capped") {
        graft.queries.GraphOps
          .resourceAllocScores(plantedHub(10000), capC = 1024).count()
      }
      // vocabulary ×N for the fuzzy join: replica k prefixes every word
      // with a 9-char tag built from three letters each repeated 3× —
      // two distinct tags differ in a whole letter group, i.e. ≥ 3
      // positions, so cross-replica pairs sit beyond maxDist=2 and true
      // matches scale ~linearly while the gram space is shared across
      // replicas (tagged words keep their common interior grams), which
      // is exactly the df-explosion the rarest-gram prefix filter must
      // absorb. 26³ distinct tags; fail loudly rather than silently
      // reuse a tag (replica k and k+26³ would alias, collapsing under
      // distinct() and deflating the scaling claim).
      family("fuzzy_join") {
        require(replicas <= 26 * 26 * 26,
          s"fuzzy_join tag space is 26^3 = ${26 * 26 * 26}; got $replicas replicas")
        val words = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .filter(length(col("w")) >= 2).distinct()
        val vocab = (0 until replicas).map { k =>
          val tag = s"${('a' + k / 676 % 26).toChar.toString * 3}" +
            s"${('a' + k / 26 % 26).toChar.toString * 3}" +
            s"${('a' + k % 26).toChar.toString * 3}"
          words.select(concat(lit(tag + "_"), col("w")).as("w"))
        }.reduce(_ unionByName _)
        graft.operators.FuzzyJoin
          .levenshteinSelfJoin(vocab, "w", maxDist = 2).count()
      }
      // SHORT-stratum stress (untagged): the prefix tag above pushes
      // every word past the q-gram floor, so the tagged family never
      // exercises the 1-gram path. A language's short-word vocabulary
      // SATURATES — 100 TB of text has the same distinct 2–4-char
      // words as 100 GB — so the right model is a fixed dense short
      // vocabulary (here ALL 3-char strings over an 18-letter alphabet,
      // 5,832 words: denser in distance-≤2 neighbors than any natural
      // language) replicated ×N as corpus ROWS. The claim under test is
      // flat-in-replicas wall time (distinct() collapses repetition
      // before any pair work) and that the 1-gram-blocked stratum
      // survives the densest short space without an all-pairs cross.
      family("fuzzy_join_short") {
        val n = 18
        val vocabOnce = spark.range(0, n.toLong * n * n).select(concat(
          expr(s"char(97 + cast(id / ${n * n} as int))"),
          expr(s"char(97 + cast(id / $n as int) % $n)"),
          expr(s"char(97 + cast(id % $n as int))")).as("w"))
        val corpus = (0 until replicas).map(_ => vocabOnce)
          .reduce(_ unionByName _)
        graft.operators.FuzzyJoin
          .levenshteinSelfJoin(corpus, "w", maxDist = 2).count()
      }
      // customer ×N with shifted keys, diffed against a derived new
      // snapshot with the declared query's change mix (mod-13 deletes,
      // mod-11 updates, mod-17 inserts). The replica shift is a
      // multiple of 13·11·17 = 2431 so every replica's keys keep their
      // base residues mod each classifier — changes per replica are
      // IDENTICAL, emitted rows scale exactly linearly, and the claim
      // is linear wall time through ONE full-outer sort-merge join
      // with the unchanged mass (the dominant fraction) dropped at the
      // join. The insert shift (1e12) sits far above any replica's key
      // range (max 26^3 replicas × 1.2155e6 ≈ 2.1e10), so inserted
      // keys never collide with a higher replica's range and the
      // full-outer join stays duplicate-free on both sides.
      family("snapshot_diff") {
        val c0 = spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        val c = (0 until replicas).map { k =>
          c0.select((col("c_custkey") + lit(k.toLong * 1215500L)).as("c_custkey"),
            col("c_acctbal"), col("c_mktsegment"))
        }.reduce(_ unionByName _)
        val newSnap = c.filter(col("c_custkey") % 13 =!= 0)
          .withColumn("c_acctbal", when(col("c_custkey") % 11 === 0,
            col("c_acctbal") + 50.0).otherwise(col("c_acctbal")))
          .unionByName(c.filter(col("c_custkey") % 17 === 0)
            .withColumn("c_custkey", col("c_custkey") + 1000000000000L))
        graft.operators.SnapshotDiff
          .diff(c, newSnap, Seq("c_custkey"), Seq("c_acctbal", "c_mktsegment"))
          .count()
      }
      // disjoint graph copies (same construction as pagerank) with the
      // seed pattern shifted into every copy: per-copy level sets are
      // identical, so reached counts scale exactly linearly; the claim
      // is linear wall time per round — frontier-only expansion means
      // a round shuffles O(frontier-adjacent edges), and the anti-join
      // against visited must not degrade as visited decuples
      family("bfs") {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey"))
        val po = (0 until replicas).map { k =>
          li.select((col("l_orderkey") + lit(k.toLong * 1000000000L)).as("ok"),
            (col("l_partkey") + lit(k.toLong * 10000000L)).as("pk"))
        }.reduce(_ unionByName _).distinct()
        val half = po.select(col("ok"), col("pk").as("src"))
          .join(po.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") < col("dst"))
          .select("src", "dst").distinct()
        val edges = half.unionByName(
          half.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = po.select(col("pk").as("id")).distinct()
          .filter(col("id") % 100 === 0)
        graft.queries.GraphOps.bfsDistances(edges, seeds, maxDepth = 3)
          .count()
      }
      // same disjoint copies for neighbor Jaccard: per-copy pair sets
      // are identical, so qualifying pairs scale exactly linearly; the
      // claim is flat per-pair cost — the bounded per-order expansion
      // (≤ 7 parts/order) must keep the intersection stage linear and
      // the two degree joins must stay equi as hubs replicate
      family("neighbor_jaccard") {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey"))
        val po = (0 until replicas).map { k =>
          li.select((col("l_orderkey") + lit(k.toLong * 1000000000L)).as("ok"),
            (col("l_partkey") + lit(k.toLong * 10000000L)).as("pk"))
        }.reduce(_ unionByName _).distinct()
        graft.queries.GraphOps.neighborJaccard(po, minCommon = 2L).count()
      }
      // part-name vocabulary ×N, every TOKEN tagged per replica (the
      // fuzzy_join tag alphabet): token blocks stay replica-local and
      // the same size as the base vocabulary's, so CANDIDATES scale
      // exactly linearly (448 per replica) — the claim under test is
      // that shared-token blocking's cost tracks BLOCK VOLUME, not
      // vocabulary², as new content grows the token space. NOTE the
      // shared 10-char tag inflates JW above 0.85 for every candidate
      // (Winkler prefix boost on tagged tokens), so the threshold
      // filter passes all 448×N — deliberate: the kernel then runs on
      // EVERY candidate, making this a pure block-volume + per-pair
      // kernel cost probe, not a selectivity probe
      family("fuzzy_jaro") {
        require(replicas <= 26 * 26 * 26,
          s"fuzzy_jaro tag space is 26^3; got $replicas replicas")
        val names = spark.read.parquet(s"$sfDir/part.parquet")
          .select(col("p_name").as("name")).filter(col("name").isNotNull)
          .distinct()
        val vocab = (0 until replicas).map { k =>
          val tag = s"${('a' + k / 676 % 26).toChar.toString * 3}" +
            s"${('a' + k / 26 % 26).toChar.toString * 3}" +
            s"${('a' + k % 26).toChar.toString * 3}"
          names.select(
            regexp_replace(col("name"), "(^| )", "$1" + tag + "_").as("name"))
        }.reduce(_ unionByName _)
        graft.operators.FuzzyJoin
          .jaroWinklerSelfJoin(vocab, "name", minSim = 0.85, tokenDiff = 1)
          .count()
      }
      // VOCABULARY-growth probe — the round-12 `weak` scenario: a
      // universal stopword token ("corp") shared by EVERY name while
      // the distinguishing tokens stay rare (df ≈ 2: consecutive names
      // chain-share one token so blocks exist but stay O(1)). The
      // all-shared-token design candidates through the corp block =
      // C(V,2), quadratic in vocabulary; rarest-token-prefix blocking
      // keeps only each name's 2 rarest tokens, the stopword never
      // enters a prefix, and candidate volume is Σ df_prefix² = O(V).
      // Claim: near-linear wall time in V (per-name cost
      // flat-to-falling), with linearly growing candidate survivors.
      family("fuzzy_jaro_vocab") {
        val v = replicas.toLong * 8192L
        val vocab = spark.range(0, v).select(
          concat(lit("tok"), format_string("%07d", col("id")), lit(" tok"),
            format_string("%07d", (col("id") + 1) % v), lit(" corp"))
            .as("name"))
        graft.operators.FuzzyJoin
          .jaroWinklerSelfJoin(vocab, "name", minSim = 0.85, tokenDiff = 1)
          .count()
      }
      // contrast arm: the SAME vocabulary through round-12's
      // all-shared-token candidate join — run at low replica counts
      // only to put a measured number on the quadratic it was flagged
      // for (the corp block alone is C(V,2) candidate pairs)
      family("fuzzy_jaro_vocab_alltok") {
        val v = replicas.toLong * 8192L
        val vocab = spark.range(0, v).select(
          concat(lit("tok"), format_string("%07d", col("id")), lit(" tok"),
            format_string("%07d", (col("id") + 1) % v), lit(" corp"))
            .as("name"))
        val tok = vocab.select(col("name"),
          explode(split(col("name"), " ")).as("t"))
        val cand = tok.select(col("t"), col("name").as("a"))
          .join(tok.select(col("t"), col("name").as("b")), "t")
          .filter(col("a") < col("b"))
          .select("a", "b").distinct()
        cand.withColumn("jw", org.apache.spark.sql.graft.JaroWinkler
            .columnFor(col("a"), col("b")))
          .filter(col("jw") >= 0.85).count()
      }
      // documents ×N with IDENTICAL text (ids shifted) — the
      // fully-duplicated corpus, span dedup's worst case: every 8-gram
      // beyond replica 0 is a duplicate, so removal mass ∝ corpus. The
      // claims under test: (a) the every-doc grams (df = 500·N per
      // position) collapse in the partial min/count aggregate — corpus
      // duplication must NOT become shuffle mass; (b) the coverage
      // window costs one row per token + one per mark even when marks
      // cover everything (overlap merge is the window's running max,
      // never an interval×token join). Wall time must stay ~linear in
      // N; the returned count (Σ removed tokens) has an EXACT linear
      // form — in replicas k>0 every token of every ≥8-token doc sits
      // under a duplicated window, so removed(N) = removed(1) +
      // (N−1)·T₈ with T₈ the ≥8-token-doc token mass. Sub-linear means
      // a lost duplicate, super-linear means double-marking.
      family("span_dedup") {
        val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), lower(col("text")).as("text"))
        val docs = (0 until replicas).map { k =>
          d0.select((col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
            col("text"))
        }.reduce(_ unionByName _)
        graft.operators.SpanDedup
          .removeDuplicateSpans(docs, "doc_id", "text", w = 8)
          .agg(sum("n_removed")).head().getLong(0)
      }
      // the 100 TB key regime: identical construction, grams shipped as
      // 8-byte xxhash64 fingerprints — the claim is the SAME removal
      // count (collision-free at this scale) with lower wall time, the
      // gap widening as gram-string shuffle mass grows with the corpus
      family("span_dedup_fp") {
        val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), lower(col("text")).as("text"))
        val docs = (0 until replicas).map { k =>
          d0.select((col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
            col("text"))
        }.reduce(_ unionByName _)
        graft.operators.SpanDedup
          .removeDuplicateSpans(docs, "doc_id", "text", w = 8,
            fingerprintGrams = true)
          .agg(sum("n_removed")).head().getLong(0)
      }
      // customer ×N (key shift a multiple of lcm(7,13,14,21) = 546 so
      // every replica's change mix is identical) + the declared
      // query's 4-stage log per replica. Claim: linear wall time
      // through ONE union + max-struct aggregate — no join, per-key
      // history folds map-side; output rows scale exactly linearly.
      // Inserted keys shift by 1e12, far above any replica range.
      family("cdc_apply") {
        val c0 = spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        val base = (0 until replicas).map { k =>
          c0.select((col("c_custkey") + lit(k.toLong * 546L * 2500L)).as("c_custkey"),
            col("c_acctbal"), col("c_mktsegment"))
        }.reduce(_ unionByName _)
        def tagged(df: org.apache.spark.sql.DataFrame, seq: Long, op: String) =
          df.withColumn("seq", lit(seq)).withColumn("op", lit(op))
        val log = tagged(base.filter(col("c_custkey") % 7 === 0)
            .withColumn("c_acctbal", col("c_acctbal") + 10.0), 1L, "U")
          .unionByName(tagged(base.filter(col("c_custkey") % 13 === 0)
            .withColumn("c_custkey", col("c_custkey") + 1000000000000L), 1L, "I"))
          .unionByName(tagged(base.filter(col("c_custkey") % 14 === 0)
            .select(col("c_custkey"), lit(null).cast("double").as("c_acctbal"),
              lit(null).cast("string").as("c_mktsegment")), 2L, "D"))
          .unionByName(tagged(base.filter(col("c_custkey") % 21 === 0)
            .withColumn("c_acctbal", col("c_acctbal") + 25.0), 3L, "U"))
        graft.operators.CdcApply.applyLog(base, log, keys = Seq("c_custkey"))
          .count()
      }
      // depth arm: FIXED key space, log depth ∝ N (every key updated N·4
      // times) — the replayed-log shape the max-struct plan exists for.
      // Claim: wall time linear in LOG VOLUME with per-record cost
      // flat-to-falling, because per-key histories collapse in the
      // partial aggregate and the exchange stays O(keys) no matter how
      // deep the log gets (a window-rank formulation would ship every
      // version through the shuffle and grow super-linearly here).
      // disjoint graph copies (same construction as bfs/jaccard):
      // k-core peeling TO THE FIXPOINT at k = 80 — at sf0.1 the
      // cascade runs 5 productive rounds and terminates on a NON-EMPTY
      // 18 863-node core (k = 90 peels to extinction — a 0-count
      // invariant is trivially linear and proves nothing). Per-copy
      // cascades are identical, so the core size is exactly linear in
      // N and the round count CONSTANT; the claim is linear wall per
      // round (two survivor equi-joins + one degree aggregate,
      // survivors only ever shrinking)
      family("kcore") {
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey"))
        val po = (0 until replicas).map { k =>
          li.select((col("l_orderkey") + lit(k.toLong * 1000000000L)).as("ok"),
            (col("l_partkey") + lit(k.toLong * 10000000L)).as("pk"))
        }.reduce(_ unionByName _).distinct()
        val edges = po.select(col("ok"), col("pk").as("u"))
          .join(po.select(col("ok"), col("pk").as("v")), "ok")
          .filter(col("u") < col("v"))
          .select("u", "v").distinct()
        val (core, rounds) =
          graft.queries.GraphOps.kcoreToFixpoint(edges, k = 80)
        val n = core.count()
        println(s"[stress]   kcore rounds: $rounds")
        org.apache.spark.sql.graft.Checkpoints.release(core)
        n
      }
      // events ×N (disjoint user copies): purchases backward-as-of
      // clicks per user — the PIT-features / feature-store read shape,
      // load-bearing under join_pit_features since round 13 but never
      // curve-measured. The union+window plan shuffles (left + right)
      // through ONE keyed exchange; claim: linear wall, exactly-linear
      // matched-purchase output (per-copy results identical)
      def eventsStress() = {
        val e0 = spark.read.parquet(s"$sfDir/events.parquet")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"))
        (0 until replicas).map { k =>
          e0.select((col("user_id") + lit(k.toLong * 10000000L)).as("user_id"),
            col("ts"),
            (col("event_id") + lit(k.toLong * 1000000000L)).as("event_id"),
            col("event_type"), col("value"))
        }.reduce(_ unionByName _)
      }
      // r18 rolling min/max frame-width curve (r17 verdict #6): the
      // window formulation rescans the frame per row (cost ∝ frame
      // width), the monotonic deque is O(1)/row (cost flat in width) —
      // same hash-exchange + sort layout in both, so the wall gap IS
      // the per-row evaluation model. Keys are user_id mod 250 over the
      // replicated events (~1.4k rows/key at 8 replicas, so even the
      // 512-row frame genuinely fills). Both arms share the min_periods
      // gate and are spec-pinned equal (Round18Spec); the declared
      // `window_rolling_minmax_wide` runs the deque, its oracle the
      // window phrasing.
      def rollEvents() = eventsStress()
        .select(pmod(col("user_id"), lit(250L)).as("k"),
          col("ts"), col("event_id"), col("value"))
      def rollWin(frame: Int): Long = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("ts", "event_id")
          .rowsBetween(-(frame - 1), 0)
        val n = count(lit(1)).over(w)
        rollEvents().select(
            when(n === frame, min(col("value")).over(w)).as("mn"),
            when(n === frame, max(col("value")).over(w)).as("mx"))
          .agg(count(col("mn")) + count(col("mx"))).collect()(0).getLong(0)
      }
      def rollDeq(frame: Int): Long =
        graft.operators.RollingDeque.withRollingMinMax(rollEvents(),
            Seq("k"), Seq("ts", "event_id"), "value", frame)
          .agg(count(col("roll_min")) + count(col("roll_max")))
          .collect()(0).getLong(0)
      if (Seq("rollminmax_win_20", "rollminmax_win_64", "rollminmax_win_512",
          "rollminmax_deq_20", "rollminmax_deq_64", "rollminmax_deq_512")
          .exists(famFilter)) {
        // untimed warm-up: the first family would otherwise absorb the
        // one-time events build + codegen and read 4-5x its replay time
        rollWin(2); rollDeq(2)
      }
      family("rollminmax_win_20")(rollWin(20))
      family("rollminmax_win_64")(rollWin(64))
      family("rollminmax_win_512")(rollWin(512))
      family("rollminmax_deq_20")(rollDeq(20))
      family("rollminmax_deq_64")(rollDeq(64))
      family("rollminmax_deq_512")(rollDeq(512))
      family("asof_join") {
        val ev = eventsStress()
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value").as("click_value"))
        graft.operators.AsofJoin.backward(purchases, clicks, ts = "ts",
            by = Seq("user_id"), payload = Seq("click_value"))
          .filter(col("click_value").isNotNull).count()
      }
      // k-stream PIT join, wall vs k at CONSTANT data volume: the k
      // "feature groups" partition the same click set (event_id mod k),
      // so every k sees identical total rows — any wall growth is pure
      // plan cost. Claim: backwardMulti is ~flat in k (one union, one
      // window, one exchange regardless), while the chained per-stream
      // form pays k keyed sort-shuffles of the accumulating label frame.
      def pitSides(k: Int) = {
        val ev = eventsStress()
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val streams = (0 until k).map { i =>
          graft.operators.AsofJoin.AsofStream(
            ev.filter(col("event_type") === "click" &&
                pmod(col("event_id"), lit(k.toLong)) === i)
              .select(col("user_id"), col("ts"), col("value").as(s"f$i")),
            Seq(s"f$i"))
        }
        (purchases, streams)
      }
      def pitMulti(k: Int): Long = {
        val (p, s) = pitSides(k)
        graft.operators.AsofJoin.backwardMulti(p, s, "ts", Seq("user_id"))
          .filter(col("f0").isNotNull).count()
      }
      def pitChained(k: Int): Long = {
        val (p, s) = pitSides(k)
        s.foldLeft(p)((acc, st) => graft.operators.AsofJoin.backward(
            acc, st.right, "ts", Seq("user_id"), st.payload))
          .filter(col("f0").isNotNull).count()
      }
      family("pit_multi_k2")(pitMulti(2))
      family("pit_multi_k4")(pitMulti(4))
      family("pit_multi_k8")(pitMulti(8))
      family("pit_chained_k2")(pitChained(2))
      family("pit_chained_k4")(pitChained(4))
      family("pit_chained_k8")(pitChained(8))
      // incremental join-view maintenance vs the nightly rebuild it
      // replaces: base tables ×N (orderkey shift keeps referential
      // pairing), the DELTA fixed at replica 0's ≥ 1998-01-01 rows.
      // view_delta joins each base ONCE against a broadcast delta —
      // claim: wall ~linear in base (scan-bound), emitted rows CONSTANT
      // in N (the fixed delta only ever meets its own replica's keys).
      // view_recompute is the naive rebuild (full SMJ of both bases) on
      // the SAME data — the contrast arm whose shuffle mass grows with
      // the corpus; the measured gap is the argument for maintaining
      // views incrementally.
      def viewStressSides() = {
        val cut = to_date(lit("1998-01-01"))
        val o0 = spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
        val l0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
        def shifted(df: org.apache.spark.sql.DataFrame, kc: String, k: Int) =
          df.withColumn(kc, col(kc) + lit(k.toLong * 100000000L))
        val oBase = (0 until replicas).map { k =>
          if (k == 0) shifted(o0, "o_orderkey", k).filter(col("o_orderdate") < cut)
          else shifted(o0, "o_orderkey", k)
        }.reduce(_ unionByName _)
        val lBase = (0 until replicas).map { k =>
          if (k == 0) shifted(l0, "l_orderkey", k).filter(col("l_shipdate") < cut)
          else shifted(l0, "l_orderkey", k)
        }.reduce(_ unionByName _)
        val oDelta = o0.filter(col("o_orderdate") >= cut)
        val lDelta = l0.filter(col("l_shipdate") >= cut)
        (oBase, oDelta, lBase, lDelta)
      }
      family("view_delta") {
        val (oBase, oDelta, lBase, lDelta) = viewStressSides()
        graft.operators.IncrementalJoinView.insertDelta(
          oBase, oDelta, lBase, lDelta,
          aKeys = Seq("o_orderkey"), bKeys = Seq("l_orderkey")).count()
      }
      family("view_recompute") {
        val (oBase, oDelta, lBase, lDelta) = viewStressSides()
        oBase.unionByName(oDelta)
          .join(lBase.unionByName(lDelta),
            col("o_orderkey") === col("l_orderkey")).count()
      }
      family("cdc_apply_deep") {
        val base = spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        val depth = replicas * 4
        val versions = spark.range(1, depth + 1L).select(col("id").as("seq"))
        val log = base.crossJoin(broadcast(versions))
          .select(col("c_custkey"),
            (col("c_acctbal") + col("seq")).as("c_acctbal"),
            col("c_mktsegment"), col("seq"),
            when(col("seq") % 5 === 0, "D").otherwise("U").as("op"))
        graft.operators.CdcApply.applyLog(base, log, keys = Seq("c_custkey"))
          .count()
      }
      // r18 log-structured version storage A/B (r17 verdict #2): replay
      // 16 nightly upsert batches (each touching 1/16 of the keys — the
      // realistic delta fraction) into the full-snapshot layout vs the
      // snapshotEvery=8 log layout. The recorded numbers are the two
      // tables' on-disk BYTES: full ≈ 16 × table (every batch a full
      // copy), log ≈ 2 snapshots + 14 deltas ≈ 3 × table — the gap that
      // makes a retained time-travel window affordable at 100 TB, where
      // keepN × table-size is untenable (a real deployment's Delta/
      // Iceberg log is exactly this shape). Current-read parity between
      // the layouts is asserted inside the arm.
      def upsertStressBase() = {
        val c0 = spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey").as("user_id"),
            col("c_acctbal").as("value"), col("c_mktsegment").as("seg"))
        (0 until replicas).map { k =>
          c0.withColumn("user_id", col("user_id") + lit(k.toLong * 10000000L))
        }.reduce(_ unionByName _)
          .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
          .withColumn("event_id", col("user_id"))
      }
      def upsertReplay(dir: String, snapshotEvery: Int): Long = {
        val base = upsertStressBase()
        (0 until 16).foreach { i =>
          val b =
            if (i == 0) base // night 0 seeds the full table
            else base.filter(pmod(col("user_id"), lit(16L)) === (i.toLong - 1))
              .withColumn("value", col("value") + lit(i.toDouble))
              .withColumn("event_id", col("event_id") + lit(i.toLong))
          graft.streaming.Streams.applyUpsertBatch(b, i.toLong, dir,
            snapshotEvery = snapshotEvery)
        }
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      }
      val upsertDirs = java.nio.file.Files
        .createTempDirectory("stress_upsert_layout").toString
      family("upsert_layout_full") {
        val bytes = upsertReplay(s"$upsertDirs/full", 1)
        counts("upsert_full_bytes") = bytes
        graft.streaming.Streams.readUpsertTable(spark, s"$upsertDirs/full").count()
      }
      family("upsert_layout_log") {
        val bytes = upsertReplay(s"$upsertDirs/log", 8)
        counts("upsert_log_bytes") = bytes
        val full = graft.streaming.Streams
          .readUpsertTable(spark, s"$upsertDirs/full")
        val log = graft.streaming.Streams
          .readUpsertTable(spark, s"$upsertDirs/log")
        val diff = full.exceptAll(log).count() + log.exceptAll(full).count()
        require(diff == 0, s"layouts diverge by $diff rows")
        log.count()
      }
      // aggregate maintenance under I/U/D (agg_refresh_cdc's device) vs
      // the per-cycle rebuild it replaces. Base = customer ×N; the CDC
      // log is FIXED (replica 0's D/U/I mutation set), so:
      //   agg_refresh_base — the ONE-TIME partial materialization
      //     (groupBy + parquet write), linear in N by nature;
      //   agg_refresh — the PER-CYCLE cost: stored partials ∪ signed
      //     log rows through one keyed aggregate — claim: ~FLAT in N
      //     (cost ∝ |log| + |groups|, base size never enters);
      //   agg_rebuild — the naive per-cycle alternative: apply the CDC
      //     outright and re-aggregate the full base — linear in N.
      def aggStressBase() = {
        val c0 = spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey"), col("c_mktsegment"),
            round(col("c_acctbal") * 100).cast("long").as("cents"))
        (0 until replicas).map { k =>
          c0.withColumn("c_custkey", col("c_custkey") + lit(k.toLong * 10000000L))
        }.reduce(_ unionByName _)
      }
      def aggStressSigned() = {
        // replica 0's mutation set in signed-row form (D: -before;
        // U: -before/+after incl. the %3 group move; I: +after)
        val c0 = spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey"), col("c_mktsegment"),
            round(col("c_acctbal") * 100).cast("long").as("cents"))
        val del = c0.filter(col("c_custkey") % 13 === 0)
          .select(col("c_mktsegment").as("g"), lit(-1L).as("dn"),
            (-col("cents")).as("dv"))
        val updOld = c0.filter(col("c_custkey") % 13 =!= 0 &&
            col("c_custkey") % 11 === 0)
          .select(col("c_mktsegment").as("g"), lit(-1L).as("dn"),
            (-col("cents")).as("dv"))
        val updNew = c0.filter(col("c_custkey") % 13 =!= 0 &&
            col("c_custkey") % 11 === 0)
          .select(when(col("c_custkey") % 3 === 0, lit("MACHINERY"))
            .otherwise(col("c_mktsegment")).as("g"), lit(1L).as("dn"),
            (col("cents") + 5000L).as("dv"))
        val ins = c0.filter(col("c_custkey") % 17 === 0)
          .select(col("c_mktsegment").as("g"), lit(1L).as("dn"),
            (col("cents") + 1000L).as("dv"))
        del.unionByName(updOld).unionByName(updNew).unionByName(ins)
      }
      // bucketed co-located fact join vs the plain shuffle join, with
      // MEASURED shuffle volume (local wall misprices exchanges — a
      // local[n] shuffle is a memcpy, a cluster shuffle is disk+network;
      // the ShuffleStats record is the plan-choice argument):
      //   bucketed_facts_write — the one-time layout cost (two bucketed
      //     writes), linear in N by nature;
      //   bucketed_facts_join — per-query: join reads co-located
      //     buckets, the ONLY shuffle is the 5-row priority aggregate;
      //   plain_facts_join — per-query without the layout: both fact
      //     tables shuffle in full, every single query, forever.
      def factsStress() = {
        val o0 = spark.read.parquet(s"$sfDir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderpriority"))
        val l0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_extendedprice"))
        def rep(df: org.apache.spark.sql.DataFrame, kc: String) =
          (0 until replicas).map { k =>
            df.withColumn(kc, col(kc) + lit(k.toLong * 100000000L))
          }.reduce(_ unionByName _)
        (rep(o0, "o_orderkey"), rep(l0, "l_orderkey"))
      }
      def factsAgg(o: org.apache.spark.sql.DataFrame,
          l: org.apache.spark.sql.DataFrame) =
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      val bfO = s"stress_bucketed_orders_$replicas"
      val bfL = s"stress_bucketed_lineitem_$replicas"
      family("bucketed_facts_write") {
        val (o, l) = factsStress()
        graft.operators.Bucketing.writeBucketed(o, bfO, "o_orderkey", 64)
        graft.operators.Bucketing.writeBucketed(l, bfL, "l_orderkey", 64)
        spark.table(bfO).count() + spark.table(bfL).count()
      }
      def joinWithStats(label: String, o: org.apache.spark.sql.DataFrame,
          l: org.apache.spark.sql.DataFrame): Long = {
        val agg = factsAgg(o, l)
        val st = org.apache.spark.sql.graft.ShuffleStats.of(agg)
        println(s"[stress]   $label shuffle: ${st.exchanges} exchanges, " +
          s"${st.records} records, ${st.bytes} bytes")
        counts(s"${label}_shuffle_records") = st.records
        counts(s"${label}_shuffle_bytes") = st.bytes
        agg.count()
      }
      family("bucketed_facts_join") {
        joinWithStats("bucketed_facts_join", spark.table(bfO), spark.table(bfL))
      }
      family("plain_facts_join") {
        val (o, l) = factsStress()
        joinWithStats("plain_facts_join", o, l)
      }
      val aggPartialsDir = s"/tmp/stress_agg_partials_$replicas"
      family("agg_refresh_base") {
        val p = aggStressBase().groupBy(col("c_mktsegment").as("g"))
          .agg(count(lit(1)).as("dn"), sum("cents").as("dv"))
        p.write.mode("overwrite").parquet(aggPartialsDir)
        spark.read.parquet(aggPartialsDir).count()
      }
      family("agg_refresh") {
        spark.read.parquet(aggPartialsDir)
          .unionByName(aggStressSigned())
          .groupBy("g")
          .agg(sum("dn").as("n"), sum("dv").as("sum_cents"))
          .count()
      }
      family("agg_rebuild") {
        val base = aggStressBase()
        val afterDel = base.filter(col("c_custkey") % 13 =!= 0 ||
          col("c_custkey") >= 10000000L)
        // the mutation only touches replica 0 (custkey < 10M), like the
        // fixed log above
        val r0 = col("c_custkey") < 10000000L
        val mutated = afterDel.select(
          when(r0 && col("c_custkey") % 11 === 0 && col("c_custkey") % 3 === 0,
            lit("MACHINERY")).otherwise(col("c_mktsegment")).as("g"),
          (col("cents") + when(r0 && col("c_custkey") % 11 === 0, 5000L)
            .otherwise(0L)).as("cents"))
        val inserted = spark.read.parquet(s"$sfDir/customer.parquet")
          .filter(col("c_custkey") % 17 === 0)
          .select(col("c_mktsegment").as("g"),
            (round(col("c_acctbal") * 100).cast("long") + 1000L).as("cents"))
        mutated.unionByName(inserted)
          .groupBy("g").agg(count(lit(1)).as("n"), sum("cents").as("s"))
          .count()
      }
    }

    if (runAnn) {
      // embeddings ×N: replica k shifts ids and adds k*0.001 to each
      // element (distinct vectors, same geometry)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val vecs = (0 until replicas).map { k =>
        emb.select((col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
          col("label"),
          transform(col("embedding"), x => x + lit(k * 0.001f)).as("embedding"))
      }.reduce(_ unionByName _)
      val nVecs = time(s"vectors build")(vecs.count())
      println(s"[stress] vectors: $nVecs (nCentroids=$nCentroids nPlanes=$nPlanes)")
      counts("corpus_vecs") = nVecs

      val query = vecs.filter(col("vec_id") === 1)
      val rest = vecs.filter(col("vec_id") =!= 1)

      // ANN: build and probe timed apart — the scaling claim is
      // build ~linear in corpus, probe ~flat (bounded cells × nProbe)
      var ivfIdx: Ann.IvfIndex = null
      family("ivf_build") {
        ivfIdx = Ann.ivfBuild(rest, "embedding", nCentroids = nCentroids)
        ivfIdx.assigned.count()
      }
      if (ivfIdx != null) {
        family("ivf_probe") {
          Ann.ivfProbe(ivfIdx, query, "embedding", "vec_id", 10, nProbe = 4).count()
        }
        // disk-backed probe: the written layout partitions by __cell, so
        // the probe's cell list prunes the scan to nProbe partitions —
        // this is the number that must stay flat as the corpus grows.
        // The whole sub-block is gated on the write family being
        // selected: readIndex on a dir nothing wrote would throw
        // OUTSIDE any family() guard and kill the summary line.
        val dir = java.nio.file.Files.createTempDirectory("graft_stress_ivf").toString
        try {
          if (famFilter("ivf_write_index")) {
            family("ivf_write_index") { Ann.writeIndex(ivfIdx, dir); 0L }
            // readIndex eagerly scans the written layout — only follow a
            // write that actually SUCCEEDED (family() caught a failure:
            // counts has no entry), or the uncaught read error would
            // kill the summary line
            if (counts.contains("ivf_write_index")) {
              val onDisk = Ann.readIndex(spark, dir)
              family("ivf_probe_disk") {
                Ann.ivfProbe(onDisk, query, "embedding", "vec_id", 10, nProbe = 4).count()
              }
              // r17 compaction A/B, the cell-tree twin of the token-table
              // arm: 32 nightly appends stack one file per touched cell
              // (files/cell = 33), the SAME pruned probe runs over the
              // fragmented tree, compactIndex rewrites to one file per
              // cell, the probe runs again over IDENTICAL rows — the
              // wall ratio is pure per-file open/footer overhead inside
              // the nProbe pruned cells.
              if (famFilter("ivf_appends")) {
                family("ivf_appends") {
                  (0 until 32).foreach { k =>
                    Ann.appendIndex(spark, dir,
                      rest.filter(pmod(col("vec_id"), lit(32L)) === k)
                        .select((col("vec_id") + lit(100000000000L)).as("vec_id"),
                          col("label"), col("embedding")),
                      "embedding")
                  }
                  Ann.readIndex(spark, dir).assigned.count()
                }
                family("ivf_probe_fragmented") {
                  Ann.ivfProbe(Ann.readIndex(spark, dir), query,
                    "embedding", "vec_id", 10, nProbe = 4).count()
                }
                family("ivf_compact") {
                  val ran = Ann.compactIndexIfNeeded(spark, dir, maxFilesPerCell = 4)
                  require(ran, "threshold guard failed to fire at 33 files/cell")
                  Ann.readIndex(spark, dir).assigned.count()
                }
                family("ivf_probe_compacted") {
                  Ann.ivfProbe(Ann.readIndex(spark, dir), query,
                    "embedding", "vec_id", 10, nProbe = 4).count()
                }
              }
            }
          }
        } finally {
          ivfIdx.release()
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        }
      }

      var lshIdx: Ann.LshIndex = null
      family("lsh_build") {
        lshIdx = Ann.lshBuild(rest, "embedding", nPlanes = nPlanes, dim = 64)
        lshIdx.bucketed.count()
      }
      if (lshIdx != null) {
        try {
          family("lsh_probe") {
            Ann.lshProbe(lshIdx, query, "embedding", "vec_id", 10).count()
          }
        } finally lshIdx.release()
      }
      var pqIdx: Ann.PqIndex = null
      family("pq_build") {
        pqIdx = Ann.pqBuild(rest, "embedding", "vec_id", m = 8, k = 16)
        pqIdx.codes.count()
      }
      if (pqIdx != null) {
        try {
          family("pq_probe") {
            Ann.pqProbe(pqIdx, rest, query, "embedding", "vec_id", 10).count()
          }
        } finally pqIdx.release()
      }
      family("brute_force_batch32") {
        val qs = vecs.filter(col("vec_id") < 32)
        Ann.bruteForceTopKBatch(rest, qs, "embedding", "vec_id", "vec_id", 10).count()
      }
    }

    // Regime/strategy parity: every ngram variant computes the SAME
    // exact pair set through a different physical plan, so when two
    // variants ran in this session their counts must be equal — a
    // divergence at stress scale is exactly the bug class the variant
    // families exist to catch, and it must fail the run, not pass
    // silently with only wall-times logged.
    val parityTwins = Seq("ngram_jaccard_sharded", "ngram_jaccard_bcast",
      "ngram_jaccard_indexed")
    for {
      base <- counts.get("ngram_jaccard")
      twin <- parityTwins
      c <- counts.get(twin)
      if c != base
    } {
      failed += 1
      println(s"[stress] PARITY VIOLATION: $twin rows $c != ngram_jaccard rows $base")
    }
    org.apache.spark.sql.graft.ListenerBus.flush(spark)
    val pinned = spark.sparkContext.getPersistentRDDs.size
    println(s"[stress] persisted RDDs at exit: $pinned (expect 0)")
    if (pinned > 0) failed += 1
    def jmap[T](m: scala.collection.Map[String, T]): String =
      m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"stress":$replicas,"nCentroids":$nCentroids,"nPlanes":$nPlanes,"times":${jmap(times.map { case (k, v) => k -> f"$v%.2f" })},"counts":${jmap(counts)},"pinned":$pinned,"failed":$failed}""")
    spark.stop()
    if (failed > 0) { println(s"[stress] $failed FAILURES"); sys.exit(1) }
    println("[stress] all families passed")
  }
}
