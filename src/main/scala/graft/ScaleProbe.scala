package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only 10× scaling probe: replicate the sf0.1 tables with shifted
  * keys and time the scale-sensitive operators on the result. Exact
  * copies are the *adversarial* corpus for dedup (every document becomes
  * a 10-clique in the pair graph), so this doubles as a stress test of
  * pair-volume handling, not just a throughput check. Results are
  * recorded in SURVEY.md §6.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val docs10 = (0 until 10).map(i =>
        docs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text"),
          col("lang"), col("source")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)

    // FRESH-TEXT 10x: each replica's text is vowel-permuted differently,
    // so grams are distinct ACROSS replicas (no df multiplication — the
    // clone-adversarial regime below is the other axis). This measures
    // whether substringPairs tracks TEXT volume (expected: the df cap
    // bounds pair volume, so cost is the gram scan + fixed shuffle
    // latency) rather than pair volume.
    val vowelPerms = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio",
      "aeiuo", "eiuoa", "iuoae", "uoaei", "oaeiu")
    val docs10Fresh = (0 until 10).map(i =>
        docs.select((col("doc_id") + i * 1000000L).as("doc_id"),
          translate(col("text"), "aeiou", vowelPerms(i)).as("text"),
          col("lang"), col("source")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)

    t("warmup") { spark.range(1000000).count() }
    t("substr_pairs_1x_df100") {
      Dedup.substringPairs(docs, minLen = 40, maxDf = 100,
        share = _.localCheckpoint(false)).count()
    }
    t("substr_pairs_1x_noshare") {
      Dedup.substringPairs(docs, minLen = 40, maxDf = 100, share = identity).count()
    }
    t("substr_pairs_10x_fresh") {
      Dedup.substringPairs(docs10Fresh, minLen = 40, maxDf = 100,
        share = _.localCheckpoint(false)).count()
    }
    // clone-adversarial substring pairs: 10 identical copies multiply
    // every shared gram's df by 10, so the gram join's pair volume is
    // Σ (10·df)² over shared grams — the regime exact dedup upstream
    // exists to prevent; the df cap is the in-operator guard (measured
    // at both the default 100 and a tight 20)
    t("substr_pairs_10x_df100") {
      Dedup.substringPairs(docs10, minLen = 40, maxDf = 100,
        share = _.localCheckpoint(false)).count()
    }
    t("substr_pairs_10x_df20") {
      Dedup.substringPairs(docs10, minLen = 40, maxDf = 20,
        share = _.localCheckpoint(false)).count()
    }
    t("repetition_10x") { TextAnalysis.repetitionMetrics(docs10).count() }
    t("pii_redact_10x") { TextAnalysis.redactPii(docs10).count() }
    t("vocab_10x") { TextAnalysis.buildVocab(docs10, topK = 100).count() }
    t("bm25_10x") { TextAnalysis.bm25(docs10, Seq("spark", "join", "window"), topK = 25).count() }
    var pairs: DataFrame = null
    t("minhash_pairs_10x") {
      pairs = Dedup.minHashLsh(docs10, numHashes = 64, bands = 16, verifyThreshold = 0.5)
        .localCheckpoint(eager = true)
      pairs.count()
    }
    t("prune_10x") { Dedup.pruneDuplicates(docs10, pairs).count() }
    // exact copies are adversarial here too: every 10-gram in a replica
    // is a duplicate occurrence, so the removal set covers ~9/10 of the
    // corpus — the worst case for the span-coverage explode. COLLECT the
    // aggregate value: count() over an ungrouped agg returns 1 without
    // executing the joins underneath (the optimizer drops them), so only
    // a collected sum measures the real work.
    t("dedup_spans_10x") {
      Dedup.dedupSpans(docs10, n = 10)
        .agg(sum(col("n_removed")), sum(length(col("text_deduped"))))
        .collect()(0).getLong(0)
    }
    // 8x the gate's merge count: measures the per-round cost curve of the
    // incremental pair-count trainer (delta explode over affected words
    // only; the naive recompute-everything form scales with merges x
    // full-corpus pair explode)
    var merges64: Seq[(String, String)] = Nil
    t("bpe_train64_10x") {
      val m = TextAnalysis.bpeTrain(docs10, merges = 64, share = _.localCheckpoint(false))
        .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
      merges64 = m
      m.size.toLong
    }
    // encode cost must be flat per merge rule: the kernel is a broadcast
    // table + per-word fusion, so plan size is constant in |merges| (the
    // compiled-fold alternative dies on Catalyst limits near ~1k). The
    // 64 learned merges are padded with vocabulary-tail-style rules that
    // mostly do not fire — exactly a real 32k table's shape, where only a
    // handful of rules apply to any one word.
    t("bpe_encode64_10x") { TextAnalysis.bpeEncode(docs10, merges64).count() }
    t("bpe_encode1k_10x") {
      val padded = merges64 ++ (0 until 960).map(i => (s"_x$i", s"_y$i"))
      TextAnalysis.bpeEncode(docs10, padded).count()
    }
    t("bpe_encode4k_10x") {
      val padded = merges64 ++ (0 until 4032).map(i => (s"_x$i", s"_y$i"))
      TextAnalysis.bpeEncode(docs10, padded).count()
    }
    // classifier training at 16x the gate's dim: per iteration the
    // driver holds dim+1 longs and the exchange carries ≤ dim+1 gradient
    // rows — iteration cost must stay ~flat in dim (bounded by the two
    // corpus-scan joins), and scoring is one broadcast join + groupBy
    t("classifier_fit_10x") {
      val labeled = docs10.withColumn("label", (col("lang") === "en").cast("long"))
      val w = Classifier.fit(labeled, dim = 1024, iters = 4, stepDiv = 1L << 23,
        share = _.localCheckpoint(false))
      Classifier.score(docs10, w, dim = 1024).agg(sum(col("p_q"))).collect()(0).getLong(0)
    }
    // cross-corpus decontamination at its adversarial worst: every probe
    // doc has 10 exact clones in the reference corpus
    t("dedup_cross_10x") {
      Dedup.minHashLshCross(docs.limit(500), docs10,
        numHashes = 64, bands = 16, verifyThreshold = 0.5).count()
    }
    t("chunk_documents_10x") {
      CorpusOps.chunkDocuments(docs10, chunkTokens = 16, overlapTokens = 4).count()
    }
    // paragraph dedup at its adversarial worst: in the 10x corpus every
    // paragraph has 10 exact occurrences, so ~9/10 of all paragraph text
    // drops and the first-occurrence table is 1/10 of the explode
    t("dedup_paragraphs_10x") {
      val paras = docs10.withColumn("text",
        concat(col("text"), lit("\n\n"), col("text")))
      Dedup.dedupParagraphs(paras)
        .agg(sum(col("n_removed")), sum(length(col("text_deduped"))))
        .collect()(0).getLong(0)
    }
    // LM scoring trains on the full 10x corpus and scores it: two count
    // groupBys (model) + two gram equi-joins (scoring); the model is a
    // distributed table, never driver or broadcast state
    t("lm_score_10x") {
      TextAnalysis.lmScore(docs10, docs10).agg(sum(col("logprob_q"))).collect()(0).getLong(0)
    }
    t("text_normalize_10x") {
      TextAnalysis.normalizeText(docs10).agg(sum(col("n_chars_norm"))).collect()(0).getLong(0)
    }
    t("vocab_drift_10x") {
      TextAnalysis.vocabDrift(docs10.filter(col("doc_id") % 2 === 0),
        docs10.filter(col("doc_id") % 2 === 1), topK = 50).count()
    }
    // DSIR at 10x: bucket counts stay bounded at dim rows no matter the
    // corpus size — the probe verifies the cost is two corpus scans plus
    // the broadcast-join score pass, not anything supra-linear
    t("dsir_score_10x") {
      TextAnalysis.importanceScore(docs10,
        TextAnalysis.importanceWeights(docs10.filter(col("lang") === "en"), docs10, dim = 1024),
        dim = 1024)
        .agg(sum(col("importance_q"))).collect()(0).getLong(0)
    }
    // upsampling multiplies the corpus by design; the probe pins that the
    // work is one scan + generate (no shuffle) even when the output is
    // ~3x the 50k-doc input
    t("upsample_10x") {
      CorpusOps.upsampleMixture(docs10,
        Seq("en" -> 1L, "de" -> 1L, "fr" -> 1L, "es" -> 1L, "zh" -> 1L)).count()
    }
    // per-host cap at its adversarial worst: 10x replication makes every
    // host a 10x-hot host, and the rank limit must stop materialization
    // at the cap per partition (WindowGroupLimit), not after it
    t("hostcap_10x") {
      val urled = docs10.withColumn("url",
        concat(lit("https://h"), pmod(col("doc_id"), lit(40L)).cast("string"),
          lit(".example.com/p")))
      CorpusOps.capPerHost(TextAnalysis.urlFeatures(urled), maxPerHost = 1000).count()
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val emb10 = (0 until 10).map(i =>
        emb.select((col("vec_id") + i * 1000000L).as("vec_id"), col("embedding"), col("label")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)
    // the 10x replicas are EXACT clones of every vector — the worst case
    // for semantic dedup (every cluster is 9/10 duplicates; the cluster
    // equi-join must bound the quadratic, and 9/10 of the corpus drops)
    t("semantic_dedup_10x") {
      Dedup.semanticDedup(emb10, k = 64, iters = 2, threshold = 0.99,
        share = _.localCheckpoint(false)).count()
    }
    // bloom decontamination vs the 10x corpus: the train side collapses
    // to one 16 KiB bitmap no matter the corpus size; probe membership
    // is scan-stage arithmetic (cost = two corpus scans, zero probe join)
    t("bloom_contamination_10x") {
      CorpusOps.bloomContamination(docs.limit(500), docs10, n = 5,
          mBits = 1 << 17, numHashes = 3)
        .agg(sum(col("n_bloom"))).collect()(0).getLong(0)
    }
    // CMS over 10x tokens: exchange volume is bounded by partitions x
    // depth x width regardless of corpus size — the probe pins one-scan
    // cost growth, not vocabulary-proportional state
    t("cms_word_counts_10x") {
      TextAnalysis.cmsWordCounts(docs10, probes = Seq("join", "scan", "customer"),
          depth = 3, width = 1024)
        .agg(sum(col("est_n"))).collect()(0).getLong(0)
    }
    // winnowing 50k docs: one codegen scan, zero shuffles — forcing the
    // full (pos, hash) surface so the kernel cost is actually measured
    t("winnow_10x") {
      TextAnalysis.winnowFingerprints(docs10, k = 5, w = 4)
        .agg(sum(col("gram_hash")), sum(col("pos"))).collect()(0).getLong(0)
    }
    // occupancy drift over shared clusters: train + two assignment scans
    // + k-row arithmetic — the cost is the k-means fit, nothing more
    t("embedding_drift_10x") {
      KMeans.clusterDrift(emb10,
        emb10.filter(col("vec_id") % 2 === 0), emb10.filter(col("vec_id") % 2 === 1),
        k = 8, iters = 2, share = _.localCheckpoint(false))
        .agg(sum(col("drift_q"))).collect()(0).getLong(0)
    }
    var km: KMeans.Model = null
    t("kmeans_10x") { // 50k vectors x 64 dims, 4 Lloyd's iterations
      km = KMeans.fit(emb10, k = 8, iters = 4, share = _.localCheckpoint(false))
      km.counts.sum
    }
    // recall eval at 10x: both legs are the audited searches; the brute
    // leg (10 probes x 500k corpus broadcast product) is the cost
    t("ann_recall_10x") {
      Ann.recallEval(emb10.filter(col("vec_id") < 10), emb10,
        k = 5, nlist = 32, nprobe = 4).count()
    }
    // outliers: fit + one shuffle-free assignment scan + TakeOrdered
    t("outliers_10x") {
      KMeans.outliers(emb10, k = 8, iters = 2, topN = 20,
        share = _.localCheckpoint(false)).count()
    }
    var pq: Ann.PqModel = null
    t("pq_train_10x") {
      pq = Ann.pqTrain(emb10, dim = 64, m = 4, ksub = 8, iters = 2,
        share = _.localCheckpoint(false))
      pq.m.toLong
    }
    t("pq_search_10x") {
      Ann.pqTopK(emb10.filter(col("vec_id") < 10), emb10, pq, k = 5).count()
    }
    var ivfpq: Ann.IvfPqModel = null
    t("ivfpq_train_10x") {
      ivfpq = Ann.ivfPqTrain(emb10, dim = 64, nlist = 8, coarseIters = 2,
        m = 4, ksub = 8, pqIters = 2, share = _.localCheckpoint(false))
      ivfpq.nlist.toLong
    }
    t("ivfpq_search_10x") {
      Ann.ivfPqTopK(emb10.filter(col("vec_id") < 10), emb10, ivfpq, k = 5, nprobe = 2,
        share = _.localCheckpoint(false)).count()
    }

    // banded interval join at 10× events (1M intervals per side-ish)
    val iv = graft.sources.EventsAdapter.intervals(spark, dir)
      .select(col("id"), col("user_id"), col("started_at"), col("finished_at"))
    val iv10 = (0 until 10).map(i =>
        iv.select((col("id") + i * 10000000L).as("id"), (col("user_id") + i * 1000L).as("user_id"),
          col("started_at"), col("finished_at")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)
    t("interval_join_10x") {
      IntervalJoin.bestOverlapMatch(iv10.filter(col("id") % 2 === 0),
        iv10.filter(col("id") % 2 === 1), bandMinutes = Some(10080.0)).count()
    }

    // exact quantiles: the count table is bounded by the value domain
    // (distinct doc lengths), so 10x corpus rows only deepen counts —
    // collect the full 25-row answer
    val docs10w = docs10.withColumn("n_chars", length(col("text")).cast("long"))
    t("exact_quantiles_10x") {
      CorpusOps.exactQuantiles(docs10w, "n_chars", Seq(2500, 5000, 9000, 9900, 10000))
        .collect().length.toLong
    }
    // the sketch twin at 10x: percentile_approx (accuracy 10000, rank
    // error ≤ 0.01% of n) must land inside the exact ±0.5%-rank value
    // window per (lang, quantile) — the bound check promoted from the
    // sf-fixture spec to scale; require() makes a drift fail the probe
    t("approx_quantiles_10x") {
      val bps = Seq(2450, 2500, 2550, 4950, 5000, 5050, 8950, 9000, 9050)
      val exact = CorpusOps.exactQuantiles(docs10w, "n_chars", bps)
        .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("q_bp")) -> r.getAs[Long]("value")).toMap
      val approx = docs10w.groupBy(col("lang"))
        .agg(expr("percentile_approx(n_chars, array(0.25, 0.5, 0.9), 10000)").as("a"))
        .collect().flatMap { r =>
          Seq(2500L, 5000L, 9000L).zip(r.getSeq[Long](1)).map { case (bp, v) => (r.getString(0), bp) -> v }
        }
      require(approx.forall { case ((lang, bp), a) =>
        exact((lang, bp - 50)) <= a && a <= exact((lang, bp + 50))
      }, s"approx quantile outside exact rank window: $approx")
      approx.map(_._2).sum
    }
    // ES top-k: one scan + per-partition top-k reduction, no corpus sort
    t("weighted_sample_10x") {
      CorpusOps.weightedSample(docs10w, k = 100, weightCol = "n_chars")
        .collect().length.toLong
    }
    // every lang key is 10x-hot (~1M rows over 5 keys); salting spreads
    // each across 32 sub-keys
    t("salted_join_10x") {
      val dim = docs10.groupBy(col("lang")).agg(count(lit(1)).as("lang_docs"))
      SkewJoin.saltedEquiJoin(docs10.select(col("doc_id"), col("lang")), dim,
        Seq("lang"), saltFactor = 32).count()
    }
    // mobility sequence ops over ~1M synthetic visits (intervals as
    // visits, 50-location alphabet -> heavy revisiting, the LZ-adversarial
    // shape where phrases stay short and the O(n^2) scan works hardest)
    val visits10 = iv10.select(col("id"), col("user_id"), col("started_at"),
      col("finished_at"), pmod(col("id"), lit(50L)).as("location_id"))
      .localCheckpoint(eager = true)
    t("return_times_10x") { Metrics.returnTimes(visits10).count() }
    t("lz_complexity_10x") {
      Metrics.lzComplexity(visits10).agg(sum(col("n_phrases"))).collect()(0).getLong(0)
    }
    // full per-position match-length pass (O(n^2) per user vs the phrase
    // walk's O(n*phrases)) + the Fano bisection — same one-shuffle shape
    t("predictability_10x") {
      Metrics.predictability(visits10).agg(sum(col("sum_lambda"))).collect()(0).getLong(0)
    }
    // LZ76 density over 50k docs: per-row cost bounded by the maxChars
    // plan constant (O(120^2) worst case), scan-only — collect the sums
    // so the kernel actually runs for every row
    t("lz_density_10x") {
      TextAnalysis.lzDensity(docs10, maxChars = 120)
        .agg(sum(col("n_phrases")), sum(col("lz_q"))).collect()(0).getLong(0)
    }
    // duplicate-segment metrics on pages where every paragraph repeats
    // (text twice) — scan-only array arithmetic, no shuffle at any size
    t("dup_segments_10x") {
      val paged = docs10.withColumn("text",
        concat(col("text"), lit("\n\n"), col("text"), lit("\nfooter\nfooter")))
      TextAnalysis.duplicateSegmentMetrics(paged)
        .agg(sum(col("n_dup_lines")), sum(col("dup_para_chars"))).collect()(0).getLong(0)
    }
    // char entropy over 50k docs: scan-only, per-row cost bounded by
    // maxChars x |alphabet| — collect the numerator sums to force it
    t("char_entropy_10x") {
      TextAnalysis.charEntropy(docs10)
        .agg(sum(col("entropy_num_q"))).collect()(0).getLong(0)
    }
    // vocab groupBy dominates; the OLS itself aggregates topK rows
    t("zipf_fit_10x") {
      TextAnalysis.zipfFit(docs10, topK = 50).collect().length.toLong
    }
    // edit-distance confirm at its adversarial worst: every doc has 10
    // exact clones, so each family is a 45-pair candidate clique that
    // survives the hamming filter and pays the full 80x80 DP
    t("editdist_pairs_10x") {
      Dedup.editDistancePairs(docs10, maxDist = 80, prefixChars = 80)
        .agg(count(lit(1)), sum(col("edit_dist"))).collect()(0).getLong(0)
    }
    t("badwords_10x") {
      TextAnalysis.badwordsFilter(docs10, Seq("slow", "crash", "zzz"))
        .filter(col("kept")).count()
    }
    t("token_fertility_10x") {
      TextAnalysis.tokenFertility(docs10)
        .agg(sum(col("sum_bpe"))).collect()(0).getLong(0)
    }
    t("concentration_10x") {
      CorpusOps.concentration(docs10).agg(sum(col("n_docs"))).collect()(0).getLong(0)
    }
    // boundary table stays |langs| x 3 no matter the corpus; assignment
    // is a broadcast join + scan comparisons — sum(stage) forces it
    t("curriculum_10x") {
      CorpusOps.curriculumStages(docs10, stages = 4)
        .agg(sum(col("stage"))).collect()(0).getLong(0)
    }
    // hybrid fusion at 10x: the two retrieval legs are the cost (bm25
    // over 50k docs, brute-force cosine over 50k vectors); fusion itself
    // moves ≤ 100 constant rows regardless of corpus size
    t("hybrid_rrf_10x") {
      val lex = TextAnalysis.bm25(docs10, Seq("spark", "join", "window"), topK = 50)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("score_q").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("rank"))
      val sem = Ann.bruteForceTopK(emb10.filter(col("vec_id") === 7), emb10, k = 50)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      Ann.rrfFuse(Seq(lex, sem), k0 = 60, topK = 25).count()
    }
    // portable HLL at 10x: the register exchange is ≤ 256 rows/group no
    // matter the corpus — vs the exact count_distinct twin below, which
    // must shuffle every distinct (group, gram) pair
    t("hll_distinct_10x") {
      Hll.distinctTokens(docs10).agg(sum(col("sum_pow"))).collect()(0).getLong(0)
    }
    t("ngram_diversity_10x") {
      TextAnalysis.ngramDiversity(docs10, n = 3)
        .agg(sum(col("n_distinct"))).collect()(0).getLong(0)
    }
    // boilerplate at its adversarial worst: 10 exact clones put EVERY
    // bigram over minDocs, so the "small side" join table is the entire
    // gram vocabulary and every position joins a match
    t("boilerplate_10x") {
      TextAnalysis.boilerplateShare(docs10, n = 2, minDocs = 5)
        .agg(sum(col("n_boiler"))).collect()(0).getLong(0)
    }
    t("cdc_chunks_10x") {
      CorpusOps.cdcChunks(docs10, k = 2, maskBits = 5)
        .agg(sum(col("n_tokens")), count(lit(1))).collect()(0).getLong(0)
    }
    t("negative_samples_10x") {
      CorpusOps.negativeSamples(docs10, k = 4).count()
    }
    t("covariance_10x") {
      EmbeddingStats.covarianceGate(emb10)
        .agg(sum(col("sum_prod"))).collect()(0).getLong(0)
    }
    // spatial keys over the 10x point cloud (~6M pfs): both are
    // scan-stage integer kernels + one bounded cell groupBy
    val pfs10 = (0 until 10).map(i =>
        sources.EventsAdapter.positionfixes(spark, dir)
          .select((col("id") + i * 10000000L).as("id"), col("user_id"),
            col("lon"), col("lat")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)
    t("zorder_cells_10x") {
      SpatialOps.zorderCells(pfs10).agg(sum(col("n_points"))).collect()(0).getLong(0)
    }
    t("geohash_cells_10x") {
      pfs10.groupBy(graft.functions.Geohash.encode(col("lon"), col("lat"), 6).as("g"))
        .agg(count(lit(1)).as("n")).agg(sum(col("n"))).collect()(0).getLong(0)
    }
    // focal hotspot over the 10x cloud: points collapse to cells first,
    // so the 9-offset explode touches the bounded cell table only
    t("hotspot_10x") {
      SpatialOps.hotspotCells(pfs10)
        .agg(sum(col("focal_points"))).collect()(0).getLong(0)
    }
    // contact pagerank at 10x users: each replica shifts lon by i degrees
    // (distinct cells), so the pair table scales linearly with replicas —
    // the fair growth model (users in different cities don't meet); the
    // adversarial same-cell case is colocation_pairs' own probe territory
    val iv10g = (0 until 10).map(i =>
        sources.EventsAdapter.intervals(spark, dir)
          .select(col("id"), (col("user_id") + i * 100000L).as("user_id"),
            col("s_us"), col("f_us"), (col("lon") + i * 1.0).as("lon"), col("lat")))
      .reduce(_.unionAll(_)).localCheckpoint(eager = true)
    t("pagerank_10x") {
      SpatialOps.colocationPagerank(
        SpatialOps.colocationPairs(iv10g, cellMicroDeg = 10000L, bandMinutes = 120.0),
        iters = 3, share = _.localCheckpoint(false))
        .agg(sum(col("rank_q"))).collect()(0).getLong(0)
    }
    // spearman/pearson over 500k docs: the two global ranks must come
    // from range repartitions (32-way sorts), never one-executor windows
    t("score_corr_10x") {
      CorpusOps.scoreCorrelation(
        docs10w.withColumn("n_words", size(split(col("text"), " ")).cast("long")),
        "n_chars", "n_words")
        .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    }
    // SQ8 over 500k x 64 values: one posexplode partial-agg into the
    // 64-row range table + one broadcast-join rescan
    t("sq8_10x") {
      Ann.sq8Profile(emb10).agg(sum(col("sum_err_q"))).collect()(0).getLong(0)
    }
    // the native L2 kernel at 10x corpus: 100 broadcast probes x 500k
    // vectors x 64 dims through plans/L2Expression — cost must scale
    // with the product, and the product only (no intermediate arrays)
    t("knn_confusion_10x") {
      Ann.knnConfusion(emb10.filter(col("vec_id") < 100), emb10, k = 5)
        .agg(sum(col("n_probes"))).collect()(0).getLong(0)
    }
    t("intrinsic_dim_10x") {
      // the clone corpus makes every probe an exact duplicate (d1 = 0 ->
      // drops by the documented convention and the result would be
      // empty); jitter each replica so the measured kernel produces the
      // estimator too
      val emb10j = (0 until 10).map(i =>
          emb.select((col("vec_id") + i * 1000000L).as("vec_id"),
            transform(col("embedding"), x => x + lit(i * 0.001f)).as("embedding")))
        .reduce(_.unionAll(_))
      Ann.intrinsicDim(emb10j.filter(col("vec_id") < 100), emb10j)
        .collect().length.toLong
    }
    spark.stop()
  }
}
