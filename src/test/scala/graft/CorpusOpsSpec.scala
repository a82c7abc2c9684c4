package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the corpus-curation operators (contamination, splitting,
  * stratified sampling, sequence packing). */
class CorpusOpsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("contamination: exact copy scores 1.0, disjoint text scores 0.0") {
    val train = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val test = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy
      (2L, "one two three four five six seven eight"),       // disjoint
      (3L, "alpha beta gamma delta epsilon xx yy zz")        // shares one 5-gram
    ).toDF("doc_id", "text")
    val r = CorpusOps.contamination(test, train, n = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((4L, 4L, 1.0)))
    assert(r(2L) == ((4L, 0L, 0.0)))
    assert(r(3L)._2 == 1L) // only "alpha beta gamma delta epsilon" is shared
  }

  test("corpusDiff: added/removed/changed/same per content hash") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val next = Seq((2L, "beta"), (3L, "gamma prime"), (4L, "delta")).toDF("doc_id", "text")
    val out = CorpusOps.corpusDiff(old, next).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
    val same = CorpusOps.corpusDiff(old, old).collect()
    assert(same.forall(_.getAs[String]("status") == "same"))
  }

  test("hashSplit: total assignment, reasonable proportions, determinism") {
    val docs = spark.range(2000).select(col("id").as("doc_id"))
    val r = CorpusOps.hashSplit(docs).groupBy("split").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.values.sum == 2000)
    assert(r("train") > 1400 && r("train") < 1800, s"train band off: $r")
    assert(r("val") > 100 && r("test") > 100)
    // pure function of the id: re-running yields identical assignment
    val a = CorpusOps.hashSplit(docs).collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val b = CorpusOps.hashSplit(docs.orderBy(col("doc_id").desc)).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(a == b)
  }

  test("stratifiedSample: per-stratum rates hold; lower rate is a subset of higher") {
    val docs = spark.range(4000)
      .select(col("id").as("doc_id"), when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val sampled = CorpusOps.stratifiedSample(docs, "lang", Map("en" -> 1000), defaultBp = 5000)
    val counts = sampled.groupBy("lang").count().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts("en") > 120 && counts("en") < 280, s"en ~10% of 2000: $counts")
    assert(counts("de") > 850 && counts("de") < 1150, s"de ~50% of 2000: $counts")
    // monotone thresholds: the 10% sample is contained in the 20% sample
    val low = sampled.filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    val high = CorpusOps.stratifiedSample(docs, "lang", Map("en" -> 2000), defaultBp = 5000)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high))
  }

  test("deterministicShuffle: dense per-shard positions, reproducible, input-order independent") {
    val docs = spark.range(1000).select(col("id").as("doc_id"))
    val r = CorpusOps.deterministicShuffle(docs, shards = 4)
    val rows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(rows.length == 1000)
    // positions are dense 0..n-1 within each shard
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq)
    }
    // every shard is populated and roughly balanced
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L) && sizes.values.forall(s => s > 180 && s < 320))
    // pure function of the key: a reversed input yields the identical permutation
    val rev = CorpusOps.deterministicShuffle(docs.orderBy(col("doc_id").desc), shards = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(rev == rows.toSet)
  }

  test("packSequences: bins respect the budget, stay contiguous, isolate oversize docs") {
    val docs = Seq(
      ("en", 0L, "a b c"),                          // 3 tokens
      ("en", 1L, "a b c d"),                        // 4 -> bin 0 total 7
      ("en", 2L, "a b c d e"),                      // 5 would make 12 > 8 -> bin 1
      ("en", 3L, (1 to 20).map(_ => "w").mkString(" ")), // 20 > budget -> own bin 2
      ("en", 4L, "a b"),                            // bin 3 (20+2 > 8)
      ("de", 5L, "x y z")                           // separate group, bin 0
    ).toDF("lang", "doc_id", "text")
    val r = CorpusOps.packSequences(docs, budgetTokens = 8)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(3)).toMap
    assert(r(("en", 0L)) == 0 && r(("en", 1L)) == 0)
    assert(r(("en", 2L)) == 1)
    assert(r(("en", 3L)) == 2, "over-budget doc gets its own bin")
    assert(r(("en", 4L)) == 3)
    assert(r(("de", 5L)) == 0, "groups pack independently")
  }

  test("packSequences: tokenCountCol packs by precomputed counts, not the whitespace proxy") {
    // text says 2 ws tokens everywhere; the real counts drive the bins
    val docs = Seq(
      ("en", 0L, "a b", 5L), ("en", 1L, "a b", 3L), // 5+3 = 8 fits
      ("en", 2L, "a b", 1L),                        // 9 > 8 -> bin 1
      ("en", 3L, "a b", 20L)                        // oversize -> bin 2
    ).toDF("lang", "doc_id", "text", "real_tokens")
    val r = CorpusOps.packSequences(docs, budgetTokens = 8, tokenCountCol = Some("real_tokens"))
      .collect().map(x => x.getLong(1) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r(0L) == ((5L, 0L)) && r(1L) == ((3L, 0L)))
    assert(r(2L) == ((1L, 1L)))
    assert(r(3L) == ((20L, 2L)))
  }

  test("rebalanceMixture: scarcest group kept in full, others thinned toward the target") {
    import org.apache.spark.sql.functions._
    // 1000 "en", 100 "de": target 1:1 -> de is scarcest (100/1 < 1000/1),
    // de keeps bp 10000 (all rows), en thins to bp 1000
    val docs = ((0L until 1000L).map(i => (i, "en")) ++ (1000L until 1100L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val out = CorpusOps.rebalanceMixture(docs, Seq("en" -> 1L, "de" -> 1L))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("de") === 100L, "scarcest group must survive in full")
    // en acceptance is hash-thinned at 1000 bp; binomial around 100
    assert(byLang("en") > 60L && byLang("en") < 140L)
  }

  test("rebalanceMixture: absent target groups are ignored, non-target groups drop") {
    import org.apache.spark.sql.functions._
    val docs = ((0L until 50L).map(i => (i, "en")) ++ (50L until 60L).map(i => (i, "zh")))
      .toDF("doc_id", "lang")
    val out = CorpusOps.rebalanceMixture(docs, Seq("en" -> 1L, "fr" -> 5L))
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs === Set("en"), "zh (non-target) drops; fr (absent) is ignored")
    assert(out.count() === 50L, "en is the only present target group -> scarcest -> full")
  }

  test("temperatureSample: T=1 passes through; T=2 flattens by sqrt of the count ratio") {
    import org.apache.spark.sql.functions._
    // 6400 "en", 100 "de": a_de = 1 (scarcest), a_en = (100/6400)^0.5 = 1/8
    val docs = ((0L until 6400L).map(i => (i, "en")) ++ (6400L until 6500L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    assert(CorpusOps.temperatureSample(docs, temperature = 1.0).count() === 6500L,
      "T=1 is the identity mix")
    val out = CorpusOps.temperatureSample(docs, temperature = 2.0)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("de") === 100L, "scarcest group keeps everything")
    // en keeps bp floor(10000/8) = 1250 -> ~800 of 6400; binomial noise band
    assert(byLang("en") > 640L && byLang("en") < 960L, s"got ${byLang("en")}")
    // flattening is monotone in T: hotter -> more aggressive en thinning
    val hotter = CorpusOps.temperatureSample(docs, temperature = 8.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(hotter("en") < byLang("en") && hotter("de") === 100L)
    // determinism: same salt, same survivors
    val again = CorpusOps.temperatureSample(docs, temperature = 2.0)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("upsampleMixture: reference group keeps one epoch; scarce groups repeat exactly") {
    // 1000 en, 100 de at target 1:1 -> en is most over-represented
    // (reference, 1 epoch); de's repeat ratio is exactly 10.0, so every
    // de doc gets exactly 10 copies (frac = 0: no hash involved)
    val docs = ((0L until 1000L).map(i => (i, "en")) ++ (1000L until 1100L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val out = CorpusOps.upsampleMixture(docs, Seq("en" -> 1L, "de" -> 1L))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") === 1000L, "reference group repeats exactly once")
    assert(byLang("de") === 1000L, "integer ratio 10 -> exactly 10 copies each")
    val enEpochs = out.filter(col("lang") === "en").select("epoch").distinct().as[Long].collect()
    assert(enEpochs.toSeq === Seq(0L), "single-epoch group carries epoch 0 only")
    val deEpochs = out.filter(col("lang") === "de" && col("doc_id") === 1000L)
      .select("epoch").as[Long].collect().sorted.toSeq
    assert(deEpochs === (0L until 10L).toSeq, "copies carry dense 0-based epochs")
  }

  test("upsampleMixture: fractional repeats land in the binomial band; deterministic") {
    // 300 en, 70 de at 1:1: rq_de = 10000*300/70 = 42857 -> base 4 copies
    // plus one more for ~28.57% of de docs (expected total 300)
    val docs = ((0L until 300L).map(i => (i, "en")) ++ (300L until 370L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val out = CorpusOps.upsampleMixture(docs, Seq("en" -> 1L, "de" -> 1L))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") === 300L)
    assert(byLang("de") >= 280L && byLang("de") <= 320L, s"got ${byLang("de")}")
    // every de doc has 4 or 5 copies — the frac decision is per-doc
    val perDoc = out.filter(col("lang") === "de").groupBy("doc_id").count()
      .select("count").distinct().as[Long].collect().toSet
    assert(perDoc.subsetOf(Set(4L, 5L)))
    val again = CorpusOps.upsampleMixture(docs, Seq("en" -> 1L, "de" -> 1L))
    assert(again.select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq ==
      out.select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq,
      "copy sets are a pure function of the row key")
  }

  test("upsampleMixture: non-target groups drop, absent target groups are ignored") {
    val docs = ((0L until 50L).map(i => (i, "en")) ++ (50L until 60L).map(i => (i, "zh")))
      .toDF("doc_id", "lang")
    val out = CorpusOps.upsampleMixture(docs, Seq("en" -> 1L, "fr" -> 5L))
    assert(out.select("lang").distinct().as[String].collect().toSet === Set("en"))
    assert(out.count() === 50L, "sole present target group is its own reference -> 1 epoch")
  }

  test("curate: each stage drops what it should; survivors carry splits") {
    import org.apache.spark.sql.functions._
    // long enough that the Gopher top-n-gram fractions (>= n/n_words
    // even with zero repetition) clear the published thresholds
    val doc1 = "the cat sat on a mat while the dog ran across to a park and " +
      "every bird flew over those trees because morning light warmed each " +
      "roof along our quiet street before noon"
    val doc2 = "seven ships left harbor early as winter storms gathered far " +
      "beyond the gray horizon and their crews watched waves climb against " +
      "old stone walls until evening came quietly down"
    val doc6 = "engineers measured the bridge span twice during spring since " +
      "heavy trucks crossed daily carrying grain from valley farms toward " +
      "rail yards beside the wide northern river basin"
    val docs = Seq(
      (1L, doc1, "en", "src0"),
      (2L, doc2, "en", "src0"),
      (3L, doc1, "en", "src0"),                     // exact dup of 1 -> pruned
      (4L, ("word " * 30).trim, "en", "src0"),      // degenerate repetition -> dropped
      (5L, "tiny", "en", "src0"),                   // under 5 words -> quality-dropped
      (6L, doc6, "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusOps.curate(docs, targetWeights = Seq("en" -> 1L))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out.keySet === Set(1L, 2L, 6L),
      "dup loser, repetitive junk and short doc must all drop")
    assert(out.values.forall(Set("train", "val", "test")))
  }

  test("rebalanceMixture is deterministic and stable under corpus growth") {
    import org.apache.spark.sql.functions._
    val base = ((0L until 400L).map(i => (i, "en")) ++ (400L until 500L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val a = CorpusOps.rebalanceMixture(base, Seq("en" -> 1L, "de" -> 1L))
      .select("doc_id").as[Long].collect().toSet
    val b = CorpusOps.rebalanceMixture(base, Seq("en" -> 1L, "de" -> 1L))
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // growing the scarce side only *raises* thresholds: every earlier
    // accepted doc stays accepted (monotone acceptance - hash decisions
    // never flip, only the cutoff moves)
    val grown = base.unionByName(
      (500L until 560L).map(i => (i, "de")).toDF("doc_id", "lang"))
    val c = CorpusOps.rebalanceMixture(grown, Seq("en" -> 1L, "de" -> 1L))
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(c))
  }

  test("corpusStats: exact counts correct; HLL estimate within rsd of exact") {
    val docs = Seq(
      (0L, "en", "a b c a b"),     // 3 distinct, 5 tokens, 9 chars
      (1L, "en", "c d"),           // en total: 4 distinct
      (2L, "de", "x y z"),
      (3L, "de", "")
    ).toDF("doc_id", "lang", "text")
    val out = CorpusOps.corpusStats(docs, Seq("lang")).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_docs") == 2 && en.getAs[Long]("n_tokens") == 7)
    assert(en.getAs[Long]("n_chars") == 12 && en.getAs[Long]("distinct_tokens") == 4)
    val de = out("de")
    assert(de.getAs[Long]("n_docs") == 2 && de.getAs[Long]("n_tokens") == 3)
    assert(de.getAs[Long]("distinct_tokens") == 3)
    // scale path: the sketch estimate tracks the exact count on real data
    val real = CorpusOps.corpusStats(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), Seq("lang")).collect()
    real.foreach { r =>
      val exact = r.getAs[Long]("distinct_tokens").toDouble
      val est = r.getAs[Long]("distinct_tokens_est").toDouble
      assert(math.abs(est - exact) <= math.max(2.0, 0.1 * exact),
        s"lang ${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("bloomContamination: no false negatives; superset of exact; saturation flags all") {
    val train = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val test = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy
      (2L, "one two three four five six seven eight"),       // disjoint
      (3L, "alpha beta gamma delta epsilon xx yy zz")        // shares one 5-gram
    ).toDF("doc_id", "text")
    // roomy filter: agrees with the exact operator on this fixture
    val roomy = CorpusOps.bloomContamination(test, train, n = 5, mBits = 1 << 16)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(roomy(1L) == ((4L, 4L))) // every truly contaminated gram flagged
    assert(roomy(2L) == ((4L, 0L)))
    assert(roomy(3L)._2 == 1L)
    // superset property on real data: bloom bounds exact from above per doc
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val te = docs.filter(col("doc_id") < 10)
    val tr = docs.filter(col("doc_id") >= 10)
    val exact = CorpusOps.contamination(te, tr, n = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    val bloom = CorpusOps.bloomContamination(te, tr, n = 5, mBits = 1 << 17)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (id, n) => assert(bloom(id) >= n, s"doc $id: bloom ${bloom(id)} < exact $n") }
    // 64-bit filter vs the full corpus: every bit set, every gram flagged
    val sat = CorpusOps.bloomContamination(te, tr, n = 5, mBits = 64)
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    sat.foreach { case (grams, hits) => assert(hits == grams) }
  }

  test("keepTopKPerGroup: exactly k per group (fewer if small), deterministic ranking") {
    val docs = Seq(
      (0L, "s1", "the a of and to x"),   // stop ratio 5/6
      (1L, "s1", "the a of x y z"),      // 3/6
      (2L, "s1", "x y z w v u"),        // 0
      (3L, "s2", "the end")
    ).toDF("doc_id", "source", "text")
    val out = CorpusOps.keepTopKPerGroup(docs, k = 2, groupCol = "source")
      .orderBy("source", "rank").collect()
    assert(out.map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSeq ==
      Seq(("s1", 0L, 1L), ("s1", 1L, 2L), ("s2", 3L, 1L)))
  }

  test("chunkDocuments: coverage, overlap, short tail, exact content") {
    // 10 words, chunk 4, overlap 1 -> stride 3 -> starts 0,3,6,9
    val words = (1 to 10).map(i => s"w$i")
    val docs = Seq((7L, words.mkString(" ")), (8L, "solo"), (9L, ""))
      .toDF("doc_id", "text")
    val out = CorpusOps.chunkDocuments(docs, chunkTokens = 4, overlapTokens = 1)
      .orderBy("doc_id", "chunk_index").collect()
    val d7 = out.filter(_.getLong(0) == 7L)
    assert(d7.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d7.map(_.getString(3)).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    assert(d7.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L, 1L))
    // every token appears in at least one chunk; consecutive chunks share
    // exactly `overlap` tokens (except the short tail)
    assert(d7.flatMap(_.getString(3).split(" ")).toSet == words.toSet)
    // single-word and empty docs
    val d8 = out.filter(_.getLong(0) == 8L)
    assert(d8.length == 1 && d8(0).getString(3) == "solo" && d8(0).getLong(2) == 1L)
    assert(!out.exists(_.getLong(0) == 9L))
    // zero overlap partitions exactly
    val flat = CorpusOps.chunkDocuments(docs.filter($"doc_id" === 7L), chunkTokens = 5)
      .orderBy("chunk_index").collect()
    assert(flat.map(_.getString(3)).toSeq == Seq("w1 w2 w3 w4 w5", "w6 w7 w8 w9 w10"))
  }

  test("exactQuantiles: hand fixture ranks, duplicates, multi-group") {
    val docs = Seq(
      ("en", 10L), ("en", 20L), ("en", 30L), ("en", 40L),
      ("de", 5L), ("de", 5L), ("de", 5L), ("de", 7L)
    ).toDF("lang", "v")
    val out = CorpusOps.exactQuantiles(docs, "v", Seq(2500, 5000, 7500, 10000))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // en: n=4, ranks ceil(q*4/10000) = 1,2,3,4
    assert(out(("en", 2500L)) == 10L && out(("en", 5000L)) == 20L)
    assert(out(("en", 7500L)) == 30L && out(("en", 10000L)) == 40L)
    // de: ranks 1,2,3 all land in the triplicated 5; rank 4 is 7
    assert(out(("de", 2500L)) == 5L && out(("de", 7500L)) == 5L)
    assert(out(("de", 10000L)) == 7L)
    assert(out.size == 8)
  }

  test("exactQuantiles: partitioning-invariant; percentile_approx agrees on an odd-count median") {
    val docs = spark.range(101).select(lit("en").as("lang"), col("id").as("v"))
    val a = CorpusOps.exactQuantiles(docs, "v", Seq(5000)).collect()
    assert(a.length == 1 && a(0).getLong(2) == 50L && a(0).getLong(3) == 101L)
    val b = CorpusOps.exactQuantiles(docs.repartition(7), "v", Seq(5000)).collect()
    assert(b(0).getLong(2) == 50L)
    // the sketch path (the 100 TB alternative when even the value domain
    // is hot) lands on the same element here
    val approx = docs.agg(expr("percentile_approx(v, 0.5, 10000)")).head.getLong(0)
    assert(approx == 50L)
  }

  test("weightedSample: exact equality with a driver-side reference twin") {
    val M = 2147483647L
    val docs = (0L until 200L).map(i => (i, "en", 10L + i % 90)).toDF("doc_id", "lang", "w")
    val got = CorpusOps.weightedSample(docs, k = 25, weightCol = "w")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // the operator's arithmetic, re-derived on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val want = (0L until 200L).map { i =>
      val w = 10L + i % 90
      val a = lnq(M) - lnq(h60(s"graft:$i") % M + 1L)
      (i, w, a * 1048576L / w)
    }.sortBy(t => (t._3, t._1)).take(25)
    assert(got.toSeq == want)
  }

  test("weightedSample: overwhelming weight always wins; non-positive weights excluded") {
    val docs = ((0L until 100L).map(i => (i, "en", 100L)) :+ ((999L, "en", 1000000000000L)))
      .toDF("doc_id", "lang", "w")
    val top = CorpusOps.weightedSample(docs, k = 1, weightCol = "w").head
    assert(top.getLong(0) == 999L)
    val zeros = Seq((1L, "en", 0L), (2L, "en", -5L), (3L, "en", 7L)).toDF("doc_id", "lang", "w")
    val kept = CorpusOps.weightedSample(zeros, k = 10, weightCol = "w").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("concentration: monoculture scores hhi 1, uniform scores 1/n") {
    val docs = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"), (4L, "en", "a"), // en: all one source
      (5L, "de", "a"), (6L, "de", "b"), (7L, "de", "c"), (8L, "de", "d")  // de: perfectly spread
    ).toDF("doc_id", "lang", "source")
    val out = CorpusOps.concentration(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("en") == ((1L, 4L, 1.0, 1.0)))
    assert(out("de") == ((4L, 4L, 0.25, 0.25)))
  }

  test("curriculumStages: per-group value bands, boundary ties land low, all stages populated") {
    // 8 docs per lang with token counts 1..8 → stages=4 boundaries at the
    // exact 25/50/75% ranks (values 2, 4, 6); tokens are single words
    val docs = (1 to 8).flatMap(i => Seq(
      (i.toLong, "en", Seq.fill(i)("w").mkString(" ")),
      (100L + i, "de", Seq.fill(i)("x").mkString(" "))))
      .toDF("doc_id", "lang", "text")
    val out = CorpusOps.curriculumStages(docs, stages = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("stage")).toMap
    for (i <- 1 to 8) {
      val expect = i match {
        case 1 | 2 => 1L // <= b1=2 (boundary value 2 lands LOW)
        case 3 | 4 => 2L
        case 5 | 6 => 3L
        case _     => 4L
      }
      assert(out(i.toLong) == expect, s"en doc $i")
      assert(out(100L + i) == expect, s"de doc $i")
    }
  }

  test("rollupCard: leaf cells, per-lang subtotals and grand total agree in one pass") {
    val docs = Seq(
      (0L, "en", "web", "one two"),
      (1L, "en", "web", "three"),
      (2L, "en", "book", "four five six"),
      (3L, "de", "web", "sieben")
    ).toDF("doc_id", "lang", "source", "text")
    val got = CorpusOps.rollupCard(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_words"), r.getAs[Long]("sum_chars")))).toMap
    assert(got(("en", "web")) == ((2L, 3L, 12L)))
    assert(got(("en", "book")) == ((1L, 3L, 13L)))
    assert(got(("de", "web")) == ((1L, 1L, 6L)))
    assert(got(("en", "<all>")) == ((3L, 6L, 25L)))   // per-lang subtotal
    assert(got(("de", "<all>")) == ((1L, 1L, 6L)))
    assert(got(("<all>", "<all>")) == ((4L, 7L, 31L))) // grand total
    assert(got.size == 6)
  }

  test("rollupCard plans as one Expand + one partial-combining aggregate — not a groupBy per level") {
    val docs = Seq((0L, "en", "web", "a b")).toDF("doc_id", "lang", "source", "text")
    val plan = CorpusOps.rollupCard(docs).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup must plan as Expand:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"rollup aggregate must map-side combine:\n$plan")
    assert(!plan.contains("Union"), s"one pass, not a union of groupBys:\n$plan")
  }

  test("sourceJsDivergence: identical distributions exactly 0, disjoint vocabularies ~ln 2") {
    val docs = Seq(
      (0L, "apple banana apple", "s1"),
      (1L, "apple banana apple", "s2"),        // identical distribution to s1
      (2L, "cherry durian cherry durian", "s3") // disjoint support
    ).toDF("doc_id", "text", "source")
    val got = CorpusOps.sourceJsDivergence(docs, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("js")).toMap
    assert(got.size == 3)
    assert(got(("s1", "s2")) == 0.0, "identical distributions: every lnq term cancels exactly")
    assert(math.abs(got(("s1", "s3")) - math.log(2.0)) < 1e-5, "disjoint support reads ln 2")
    assert(math.abs(got(("s2", "s3")) - math.log(2.0)) < 1e-5)
  }
}
