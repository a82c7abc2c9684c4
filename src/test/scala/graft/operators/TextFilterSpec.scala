package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Repetition quality filters, PII redaction, and BM25 retrieval. */
class TextFilterSpec extends SparkSpec {
  import spark.implicits._

  test("readability: hand-computed Flesch/FK on the counting contracts") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "The cat sat."),            // 1 sentence, 3 words, 3 vowel runs
      (2L, "Hmm."),                     // vowel-less word floors to 1 syllable
      (3L, "Go now! Stop? Yes."),       // 3 terminal-punct runs, 4 words, 4 runs
      (4L, "")                          // zero words -> both scores 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs)
      .select(col("doc_id"), col("n_sentences"), col("n_words"), col("n_syllables"),
        col("flesch"), col("fk_grade"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((1L, 3L, 3L,
      206.835 - 1.015 * (3.0 / 1.0) - 84.6 * (3.0 / 3.0),
      0.39 * (3.0 / 1.0) + 11.8 * (3.0 / 3.0) - 15.59)), out(1L))
    assert(out(2L) == ((1L, 1L, 1L,
      206.835 - 1.015 - 84.6, 0.39 + 11.8 - 15.59)), out(2L))
    assert(out(3L) == ((3L, 4L, 4L,
      206.835 - 1.015 * (4.0 / 3.0) - 84.6 * (4.0 / 4.0),
      0.39 * (4.0 / 3.0) + 11.8 * (4.0 / 4.0) - 15.59)), out(3L))
    assert(out(4L) == ((1L, 0L, 0L, 0.0, 0.0)), out(4L))
  }

  test("perplexityAblation: keep is the integer cross-multiply over lmScore; shares monotone") {
    val docs = Seq(
      (0L, "a a a a a a", "s1"),  // high-probability bigrams
      (1L, "b c d e f g", "s1"),  // every bigram unique → low probability
      (2L, "x", "s2"),            // zero bigrams → never kept
      (3L, "a a b c", "s2")
    ).toDF("doc_id", "text", "source")
    val thr = Seq(-10000000L, -3000000L, -500000L)
    val got = TextAnalysis.perplexityAblation(docs, docs, thr)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size == 6) // 2 sources × 3 thresholds

    // expected from lmScore directly (the decision must be EXACTLY
    // logprob_q >= t * n_bigrams with zero-bigram docs always dropped)
    val scores = TextAnalysis.lmScore(docs, docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val toks = Map(0L -> 6L, 1L -> 6L, 2L -> 1L, 3L -> 4L)
    val src = Map(0L -> "s1", 1L -> "s1", 2L -> "s2", 3L -> "s2")
    for (t <- thr; s <- Seq("s1", "s2")) {
      val ids = src.collect { case (id, ss) if ss == s => id }
      val kept = ids.filter { id =>
        val (nb, lq) = scores(id); nb > 0 && lq >= t * nb
      }
      val exp = (ids.size.toLong, kept.size.toLong,
        ids.map(toks).sum, kept.map(toks).sum)
      assert(got((s, t)) == exp, s"source $s threshold $t: ${got((s, t))} vs $exp")
    }
    // monotone: a stricter (larger) threshold never keeps more tokens
    for (s <- Seq("s1", "s2"))
      assert(got((s, -10000000L))._4 >= got((s, -3000000L))._4 &&
        got((s, -3000000L))._4 >= got((s, -500000L))._4)
    // the grid must actually separate: loosest keeps something, and the
    // zero-bigram doc is dropped everywhere (s2 never keeps all 5 tokens)
    assert(got(("s1", -10000000L))._2 > 0)
    assert(thr.forall(t => got(("s2", t))._4 < 5L))
  }

  test("mooreLewisSelection: in-domain-like docs rank first; delta matches the two lmScores") {
    val docs = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "the dog sat on the mat", "en"),
      (2L, "der hund sitzt auf der matte", "de"),
      (3L, "the cat sat on the mat", "de"), // in-domain text, off-domain label
      (4L, "x", "de")                        // zero bigrams → never selected
    ).toDF("doc_id", "text", "lang")
    val inDomain = docs.filter(col("lang") === "en")
    val got = TextAnalysis.mooreLewisSelection(docs, inDomain, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 3)
    assert(got.map(_._4).toSeq == Seq(1L, 2L, 3L)) // rank is 1..K
    // delta must be exactly lmScore(in-domain) − lmScore(general)
    val lin = TextAnalysis.lmScore(docs, inDomain)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lgen = TextAnalysis.lmScore(docs, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, _, delta, _) => assert(delta == lin(id) - lgen(id), s"doc $id") }
    // the English-looking docs (0, 1, 3 share all their bigrams with the
    // in-domain model) outrank the German one; doc 4 never appears
    val sel = got.map(_._1).toSet
    assert(sel == Set(0L, 1L, 3L), sel)
  }

  test("word_ngrams keeps multiplicity and is empty below n") {
    val df = Seq((0L, "a b a b a"), (1L, "x")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.ngrams(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(0L) == Seq("a b", "b a", "a b", "b a"))
    assert(out(1L).isEmpty)
  }

  test("repetition metrics: degenerate repetition is flagged, varied text passes") {
    val df = Seq(
      (0L, "a b a b a b"), // 2-gram "a b" x3 of 5 positions; 6 words -> top2 = 1.0
      // all-distinct words: long enough that a single n-gram occurrence
      // stays under every threshold (the rules presume non-trivial length,
      // as in the reference methodology where a min-length rule runs first)
      (1L, (1 to 30).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Double]("top2gram_frac") == 1.0) // 3*2/6
    assert(!out(0L).getAs[Boolean]("repetition_ok"))
    assert(out(1L).getAs[Double]("top2gram_frac") == 2.0 / 30.0) // every 2-gram unique
    assert(out(1L).getAs[Double]("dup5gram_frac") == 0.0)
    assert(out(1L).getAs[Boolean]("repetition_ok"))
  }

  test("repetition metrics: duplicated 5-gram fraction counts repeated positions") {
    // "a b c d e" twice -> 5-grams over 10 words: 6 grams, positions of
    // "a b c d e" repeat (2 of 6); frac = 2/6
    val df = Seq((0L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionMetrics(df).collect().head
    assert(r.getAs[Double]("dup5gram_frac") == 2.0 / 6.0)
  }

  test("pii redaction counts and replaces email, phone, ip") {
    val df = Seq(
      (0L, "mail bob.smith+x@corp.example.org now"),
      (1L, "call 415-555-0173 or 212-555-0100"),
      (2L, "host 192.168.10.254 is up"),
      (3L, "clean text with no identifiers")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("n_emails") == 1 && out(0L).getAs[String]("redacted") == "mail <EMAIL> now")
    assert(out(1L).getAs[Long]("n_phones") == 2 && out(1L).getAs[String]("redacted") == "call <PHONE> or <PHONE>")
    assert(out(2L).getAs[Long]("n_ips") == 1 && out(2L).getAs[String]("redacted") == "host <IP> is up")
    assert(out(3L).getAs[String]("redacted") == "clean text with no identifiers")
  }

  test("badwords filter: distinct hits counted, multiplicity ignored, clean docs kept") {
    val df = Seq(
      (0L, "clean words only here"),
      (1L, "bad bad bad word"),            // one blocklist word, thrice
      (2L, "bad and worse together"),      // two distinct hits
      (3L, "badly unrelated")              // substring must NOT match
    ).toDF("doc_id", "text")
    val out = TextAnalysis.badwordsFilter(df, Seq("bad", "worse")).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_badwords"), r.getAs[Boolean]("kept")))).toMap
    assert(out(0L) == ((0L, true)))
    assert(out(1L) == ((1L, false)))
    assert(out(2L) == ((2L, false)))
    assert(out(3L) == ((0L, true)))
  }

  test("badwords filter stays scan-only — no exchange in the plan") {
    val df = Seq((0L, "a b")).toDF("doc_id", "text")
    val plan = TextAnalysis.badwordsFilter(df, Seq("x")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("token fertility: exact sums per group, fertility is their ratio") {
    val df = Seq(
      (0L, "en", "one-two three"),   // ws 2, bpe: one,-,two,three = 4
      (1L, "en", "plain words"),     // ws 2, bpe 2
      (2L, "de", "a.b")              // ws 1, bpe: a,.,b = 3
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenFertility(df).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_ws"),
        r.getAs[Long]("sum_bpe"), r.getAs[Double]("fertility")))).toMap
    assert(out("en") == ((2L, 4L, 6L, 1.5)))
    assert(out("de") == ((1L, 1L, 3L, 3.0)))
  }

  test("vocab induction: rank, counts and cumulative coverage") {
    val df = Seq((0L, "b a a c b a"), (1L, "a d")).toDF("doc_id", "text")
    // counts: a=4, b=2, c=1, d=1 (ties by word); total 8
    val out = TextAnalysis.buildVocab(df, topK = 3).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("word"), r.getAs[Long]("n"), r.getAs[Double]("cum_frac")))
    assert(out.toSeq == Seq((1L, "a", 4L, 0.5), (2L, "b", 2L, 0.75), (3L, "c", 1L, 0.875)))
  }

  test("cms word counts: exact at generous width, upper bound always, absent words bounded") {
    val df = Seq((0L, "b a a c b a"), (1L, "a d")).toDF("doc_id", "text")
    // counts: a=4, b=2, c=1, d=1; 8 tokens into 4096 buckets -> no collisions
    val wide = TextAnalysis.cmsWordCounts(df, probes = Seq("a", "b", "c", "d", "nope"),
        depth = 3, width = 4096)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("est_n")).toMap
    assert(wide == Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 1L, "nope" -> 0L))
    // brutal width: estimates only ever overshoot, never undershoot
    val narrow = TextAnalysis.cmsWordCounts(df, probes = Seq("a", "b", "c", "d", "nope"),
        depth = 3, width = 2)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("est_n")).toMap
    assert(narrow("a") >= 4L && narrow("b") >= 2L && narrow("c") >= 1L && narrow("d") >= 1L)
    assert(narrow.values.forall(_ <= 8L)) // a bucket never exceeds the corpus
    // real corpus: every estimate bounds its exact count from above
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count()
    val probes = Seq("join", "scan", "filter", "zzz_absent")
    val est = TextAnalysis.cmsWordCounts(docs, probes, depth = 3, width = 1024)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("est_n")).toMap
    val truth = exact.filter(col("word").isin(probes: _*))
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("count")).toMap
    probes.foreach { p => assert(est(p) >= truth.getOrElse(p, 0L), s"$p: ${est(p)} < ${truth.get(p)}") }
  }

  test("heavyHitters: exact counts above threshold, tail excluded, collision-proof via exact filter") {
    // skewed fixture: two heavy words, a long unique tail
    val heavy = (0 until 40).map(_ => "alpha") ++ (0 until 25).map(_ => "beta")
    val tail = (0 until 200).map(i => s"tail$i")
    val df = Seq((0L, (heavy ++ tail).mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.heavyHitters(df, minCount = 20L, depth = 3, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("alpha" -> 40L, "beta" -> 25L), s"got $out")
    // brutal width forces collisions: candidates inflate, the exact
    // filter still returns precisely the true heavy hitters
    val narrow = TextAnalysis.heavyHitters(df, minCount = 20L, depth = 3, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(narrow == Map("alpha" -> 40L, "beta" -> 25L), s"got $narrow")
    // real corpus: agrees with the exact vocabulary aggregation
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count().filter(col("count") >= 50L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hh = TextAnalysis.heavyHitters(docs, minCount = 50L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == exact)
  }

  test("winnowOverlap: planted shared run votes one aligned offset; hot-hash cap prunes boilerplate") {
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 words >= w+k-1
    val probe = Seq((1L, s"p1 p2 $run p3 p4")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, s"c1 c2 c3 $run c4"),
      (11L, "completely different words with no shared fingerprint content here today"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.winnowOverlap(probe, corpus, k = 5, w = 4, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set((1L, 10L)), s"only the planted pair may match: $out")
    val (n, off, atModal) = out((1L, 10L))
    // run starts at word 2 in the probe and word 3 in the corpus doc
    assert(off == -1L, s"aligned offset must be -1: $out")
    assert(n >= 1L && atModal >= 1L && atModal <= n)
    // boilerplate cap: the same run in many corpus docs makes its hashes
    // hot; capping document frequency at 2 drops them all
    val boiler = (10L until 15L).map(i => (i, s"c$i x $run y")).toDF("doc_id", "text")
    val uncapped = TextAnalysis.winnowOverlap(probe, boiler, k = 5, w = 4, minShared = 1L)
    assert(uncapped.count() == 5L, "every boilerplate doc pairs without a cap")
    val capped = TextAnalysis.winnowOverlap(probe, boiler, k = 5, w = 4, minShared = 1L,
      maxHashFreq = 2L)
    assert(capped.count() == 0L, "hot hashes above the df cap must not join")
  }

  test("lmBuckets: fluent docs head, rare-gram docs tail, zero-bigram docs tail, tiles balanced") {
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    val docs = Seq(
      (0L, fluent, "en"), (1L, fluent, "en"), (2L, fluent, "en"),
      (3L, "the cat sat on the mat and the dog ran to a tree", "en"),
      (4L, "zyx wvu tsr qpo nml kji hgf edc", "en"), // all unseen-in-train bigrams
      (5L, "word", "en"),                            // zero bigrams -> sentinel tail
      (6L, fluent, "de"), (7L, "aaa bbb ccc ddd eee fff", "de"), (8L, "q", "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.lmBuckets(docs, docs.filter(col("doc_id") <= 3), buckets = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(4))).toMap
    assert(out(0L)._2 == "head", s"fluent repeated doc must lead: $out")
    assert(out(4L)._2 == "tail", s"unseen-bigram doc must trail: $out")
    assert(out(5L)._2 == "tail", s"zero-bigram doc must take the sentinel tail: $out")
    assert(out(8L) == (("de", "tail")), "per-lang ranking: 1-word de doc trails its own lang")
    assert(out(6L)._1 == "de" && out(6L)._2 == "head")
    // tiles balanced within 1 per lang: en has 6 docs -> 2/2/2
    val en = out.collect { case (_, ("en", b)) => b }.toSeq
    assert(Seq("head", "middle", "tail").forall(b => en.count(_ == b) == 2), s"en tiles: $en")
  }

  test("winnow fingerprints: naive reference match, shared-run guarantee, density bounds") {
    import graft.functions.PortableHash
    // naive winnowing reference: same packing, windows of w gram hashes
    def naive(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val words = text.split(" ", -1)
      val count = words.length - k + 1
      if (count <= 0) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      def h60(s: String): Long = {
        val d = md.digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
      }
      val packed = (0 until count).map { p =>
        val h = h60(words.slice(p, p + k).mkString(" ")) % PortableHash.M
        (h << 21) + ((1L << 20) - p)
      }
      val ends = (math.min(w, count) - 1) until count
      ends.map(e => packed.slice(math.max(e - w + 1, 0), e + 1).min).toSet
        .map((pk: Long) => ((1L << 20) - (pk & ((1L << 21) - 1)), pk >> 21))
    }
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val texts = (0L until 30L).map(i =>
      i -> (0 until 12 + rng.nextInt(40)).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    val df = texts.toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(df, k = 3, w = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    texts.foreach { case (id, t) =>
      assert(out.getOrElse(id, Set.empty) == naive(t, 3, 4), s"doc $id mismatch")
    }
    // density: every w consecutive grams contain a selection; never more than gram count
    texts.foreach { case (id, t) =>
      val grams = t.split(" ").length - 2
      val nSel = out.getOrElse(id, Set.empty).size
      assert(nSel <= grams && nSel >= grams / 4, s"doc $id: $nSel of $grams")
    }
    // guarantee: a shared run of >= w + k - 1 words yields a shared selected hash
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = w + k - 1 words
    val pair = Seq(
      (100L, s"one two three $shared x y z"),
      (101L, s"p q $shared r s t u v")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(pair, k = 3, w = 4)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert((fps(100L) & fps(101L)).nonEmpty, "shared run must fingerprint identically")
    // sub-k documents have no grams, hence no fingerprints
    val tiny = TextAnalysis.winnowFingerprints(Seq((0L, "just two")).toDF("doc_id", "text"), k = 3, w = 4)
    assert(tiny.count() == 0L)
  }

  test("prune duplicates keeps the smallest id of every duplicate component") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.pruneDuplicates(docs, pairs).collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 1L, 4L)) // 0 untouched; 1 and 4 represent their clusters
  }

  test("bm25 ranks by term frequency and down-weights common terms") {
    val df = Seq(
      (0L, "spark spark spark filler filler filler filler filler"),
      (1L, "spark filler filler filler filler filler filler filler"),
      (2L, "rare filler filler filler filler filler filler filler"),
      (3L, "filler filler filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(df, terms = Seq("spark", "rare"), topK = 10).collect()
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.toSet == Set(0L, 1L, 2L)) // doc 3 hits nothing
    val score = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q")).toMap
    assert(score(0L) > score(1L)) // higher tf wins at equal idf
    assert(score(2L) > score(1L)) // rarer term (df=1 vs df=2) outweighs
    // ordering is (score desc, doc_id): output already sorted
    assert(ids.toSeq == out.sortBy(r => (-r.getAs[Long]("score_q"), r.getAs[Long]("doc_id"))).map(_.getAs[Long]("doc_id")).toSeq)
  }

  /** Reference single-machine BPE trainer: symbol lists, leftmost-first
    * non-overlapping merge application, ties to the smallest (lhs, rhs).
    */
  private def naiveBpe(words: Map[String, Long], merges: Int): Seq[(Long, String, String, Long)] = {
    var seqs: Seq[(List[String], Long)] =
      words.toSeq.map { case (w, c) => (w.map(_.toString).toList, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- seqs; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((step.toLong, a, b, c))
        def app(l: List[String]): List[String] = l match {
          case x :: y :: rest if x == a && y == b => (a + b) :: app(rest)
          case x :: rest => x :: app(rest)
          case Nil => Nil
        }
        seqs = seqs.map { case (syms, c2) => (app(syms), c2) }
        step += 1
      }
    }
    out.toSeq
  }

  test("bpe training: contiguous runs fuse leftmost-first; training stops when no pair remains") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, merges = 5)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    // round 1: (a,a) appears 3 times in 'a a a a'; fusion is non-overlapping
    // leftmost-first -> 'aa aa'; round 2 merges (aa,aa); then no pairs remain
    assert(got === Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("bpe training matches the naive trainer on the classic corpus") {
    // Sennrich et al.'s worked example: low x5, lower x2, newest x6, widest x3
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, merges = 6)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    val want = naiveBpe(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6)
    assert(got === want)
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L,
      "first merge must be (e, s) with frequency 9")
  }

  test("bpe encode: learned merges shrink token counts; empty merge table counts chars") {
    val docs = Seq((1L, "abab abab"), (2L, "cd")).toDF("doc_id", "text")
    val base = TextAnalysis.bpeEncode(docs, Seq.empty)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(base(1L) === ((2L, 8L)), "char-level: 2 words x 4 chars")
    assert(base(2L) === ((1L, 2L)))
    val merged = TextAnalysis.bpeEncode(docs, Seq(("a", "b"), ("ab", "ab")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 'abab' -> [ab, ab] -> [abab]: one token per word
    assert(merged(1L) === ((2L, 2L)))
    assert(merged(2L) === ((1L, 2L)), "merges not touching 'cd' leave it char-level")
  }

  test("bpe training with the default share keeps per-round plan size bounded over 64 rounds") {
    // the trainer rewrites seqs/pc on top of the previous round's lineage;
    // with identity share the plan compounds geometrically (observed as
    // 1.6->33 MB task binaries). The default is now Share.materialize —
    // this records the logical-plan node count of every frame the default
    // hook receives (the recorder delegates to the default hook itself,
    // so the observed sizes ARE the default path's) and asserts late
    // rounds plan no bigger than early ones.
    val rnd = new scala.util.Random(47)
    val alphabet = "abcdef"
    val words = Seq.fill(200)((2 to (2 + rnd.nextInt(7))).map(_ => alphabet(rnd.nextInt(6))).mkString)
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val recordingDefault: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df => {
      sizes += df.queryExecution.logical.collect { case n => n }.length
      Share.materialize(df)
    }
    val trained = TextAnalysis.bpeTrain(docs, merges = 64, share = recordingDefault).collect()
    assert(trained.length == 64, s"corpus exhausted after ${trained.length} merges; grow the fixture")
    // >= 2 shares per round (pc delta + seqs fuse); sizes must not trend up
    assert(sizes.length >= 64)
    val early = sizes.take(8).max
    assert(sizes.max <= 2 * early,
      s"plan size grew from <=$early to ${sizes.max} nodes across rounds — lineage is compounding")
    // the default trajectory is bit-identical to the explicit opt-out.
    // Few rounds only: identity share quadruples the collapsed _sym
    // expression per round (~4^N nodes — 12 rounds OOMs an 8g heap),
    // which is precisely why the materializing hook is the default.
    val pure = TextAnalysis.bpeTrain(docs, merges = 6, share = Share.none).collect().map(_.toSeq).toSeq
    val viaDefault = TextAnalysis.bpeTrain(docs, merges = 6).collect().map(_.toSeq).toSeq
    assert(viaDefault === pure)
  }

  test("bpe token-sequence export: exact streams, word order, count consistency") {
    val docs = Seq((1L, "abab cd abab"), (2L, "cd")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeExportTokens(docs, Seq(("a", "b"), ("ab", "ab")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // 'abab' -> [abab]; 'cd' untouched -> [c, d]; word order preserved
    assert(out(1L) == ((4L, "abab c d abab")))
    assert(out(2L) == ((2L, "c d")))
    // n_tokens must agree with bpeEncode's counts on a trained table
    val words = Seq.fill(40)((1 to 5).map(_ => "abc" (scala.util.Random.nextInt(3))).mkString)
    val corpus = words.grouped(8).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrain(corpus, merges = 6)
      .select("step", "lhs", "rhs").collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val counts = TextAnalysis.bpeEncode(corpus, learned).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val streams = TextAnalysis.bpeExportTokens(corpus, learned).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streams == counts, "export token totals must equal the count kernel's")
    // partitioning invariance of the ordered stream
    val re = TextAnalysis.bpeExportTokens(corpus.repartition(7), learned).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val base = TextAnalysis.bpeExportTokens(corpus, learned).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(re == base)
  }

  test("bpe encode kernel == nested-replace fold on trained merges, incl. odd same-char runs") {
    // odd runs are where fusion order is subtle: two-pass replace turns
    // 'aaaaa' + (a,a) into [aa, a, aa], NOT the list-scan's [aa, aa, a];
    // every later merge sees different symbols if the kernel gets this wrong
    val rnd = new scala.util.Random(31)
    val alphabet = "abc"
    val words = Seq.fill(60)((1 to (1 + rnd.nextInt(7))).map(_ => alphabet(rnd.nextInt(3))).mkString) ++
      Seq("aaaaa", "aaaaaaa", "ababab", "aaaa", "abcabcabc")
    val docs = words.grouped(6).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val learned = TextAnalysis.bpeTrain(docs, merges = 12)
      .select("step", "lhs", "rhs").collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run(TextAnalysis.bpeEncode(docs, learned)) ===
      run(TextAnalysis.bpeEncodeFold(docs, learned)))
    // direct kernel pin of the odd-run case
    assert(TextAnalysis.bpeFuseWord("aaaaa", Array(("a", "a"))) == 3L)
    assert(TextAnalysis.bpeFuseWord("aaaaa", Array(("a", "a"), ("aa", "a"))) == 2L)
  }

  test("bpe training matches the naive trainer on random multi-document corpora") {
    val rnd = new scala.util.Random(29)
    val alphabet = "abcd"
    val words = Seq.fill(40)((1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val docs = words.grouped(8).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val freq = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val got = TextAnalysis.bpeTrain(docs, merges = 10)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === naiveBpe(freq, 10))
  }

  test("urlFeatures: host/userinfo/port/path/query parsing; capPerHost and blocklist") {
    val df = Seq(
      (1L, "https://user:pw@Sub1.Example.COM:8443/a/b/c?q=1"),
      (2L, "http://example.com"),
      (3L, "https://ads.tracker.net/x"),
      (4L, "https://tracker.net/y"),
      (5L, "https://nottracker.net/z"),
      (6L, "not a url at all")
    ).toDF("doc_id", "url")
    val f = TextAnalysis.urlFeatures(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getAs[String]("host") == "sub1.example.com")
    assert(f(1L).getAs[Long]("path_depth") == 3L && f(1L).getAs[Boolean]("has_query"))
    assert(f(2L).getAs[String]("host") == "example.com")
    assert(f(2L).getAs[Long]("path_depth") == 0L && !f(2L).getAs[Boolean]("has_query"))
    assert(f(6L).getAs[String]("host") == "", "non-URL yields empty host, not a crash")
    // blocklist: exact host and subdomain match, no substring false positive
    val kept = CorpusOps.filterBlockedHosts(TextAnalysis.urlFeatures(df), Seq("tracker.net"))
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(3L) && !kept.contains(4L), "exact + subdomain blocked")
    assert(kept.contains(5L), "'nottracker.net' must NOT match blocked 'tracker.net'")
    // capPerHost: deterministic, keeps exactly k, dense 1-based ranks
    val many = (0L until 100L).map(i => (i, s"h${i % 3}.com")).toDF("doc_id", "host")
    val capped = CorpusOps.capPerHost(many, maxPerHost = 10)
    assert(capped.count() === 30L)
    val ranks = capped.groupBy("host").agg(max("host_rank").as("m"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    assert(ranks.forall { case (_, m, n) => m == 10L && n == 10L })
    val again = CorpusOps.capPerHost(many, maxPerHost = 10).select("doc_id").as[Long].collect().sorted
    assert(again.toSeq == capped.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("normalizeText: NFC composes, control bytes drop, whitespace collapses") {
    val acute = 0x0301.toChar; val composed = 0x00E9.toChar // e+U+0301 vs é
    val dirty = s"Cafe$acute  \t x${0x01.toChar}y${0x7f.toChar}z \n end "
    val df = Seq((1L, dirty), (2L, "already clean")).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("text_norm") == s"Caf$composed xyz end")
    assert(out(1L).getAs[Boolean]("changed"))
    assert(out(1L).getAs[Long]("n_chars_norm") < out(1L).getAs[Long]("n_chars_raw"))
    assert(out(2L).getAs[String]("text_norm") == "already clean")
    assert(!out(2L).getAs[Boolean]("changed"))
    // tab/newline survive the control strip and fold into the collapse;
    // NFD decomposes what NFC composes
    val forms = df.filter(col("doc_id") === 1L).select(
      TextAnalysis.unicodeNormalize(col("text"), "NFC").as("c"),
      TextAnalysis.unicodeNormalize(col("text"), "NFD").as("d")).head()
    assert(forms.getString(0).contains(s"Caf$composed"))
    assert(forms.getString(1).contains(s"Cafe$acute"))
    // registered as a SQL function too
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql(s"SELECT unicode_normalize('Cafe$acute', 'NFC') AS s").head().getString(0)
    assert(viaSql == s"Caf$composed")
  }

  test("lmScore: hand-computed quantized log-likelihood, unseen grams, short docs") {
    def flq(n: Long): Long = math.floor(StrictMath.log(n.toDouble) * 1e6).toLong
    // train corpus: "a b" x2 and "a c" -> bigrams: (a b)x2, (a c)x1
    // unigrams: a x3, b x2, c x1 -> V = 3
    val train = Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b"),   // c12=2, c1(a)=3: flq(3) - flq(6)
      (11L, "b z"),   // unseen bigram, seen ctx b: flq(1) - flq(5) = -flq(5)
      (12L, "z q"),   // unseen bigram AND ctx: flq(1) - flq(3) = -flq(3)
      (13L, "solo"),  // <2 words -> (0, 0)
      (14L, "a b a c") // 3 bigrams: (a b) + unseen (b a) + (a c)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(score, train)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ((1L, flq(3) - flq(6))))
    assert(out(11L) == ((1L, -flq(5))))   // den = c1(b)+V = 2+3
    assert(out(12L) == ((1L, -flq(3))))   // den = 0+V
    assert(out(13L) == ((0L, 0L)))
    val d14 = (flq(3) - flq(6)) + (-flq(5)) + (flq(2) - flq(6))
    assert(out(14L) == ((3L, d14)))
    // a higher-likelihood doc scores above garbage (the CCNet filter signal)
    assert(out(10L)._2 > out(12L)._2)
  }

  test("vocabDrift: hand-computed log-ratios, union vocabulary, abs ranking") {
    def flq(n: Long): Long = math.floor(StrictMath.log(n.toDouble) * 1e6).toLong
    val a = Seq((0L, "x x x y")).toDF("doc_id", "text")  // n: x=3, y=1; tot_a=4
    val b = Seq((1L, "x z z z")).toDF("doc_id", "text")  // n: x=1, z=3; tot_b=4
    // union vocab V=3; denominators tot+V=7 cancel in the difference
    val out = TextAnalysis.vocabDrift(a, b, topK = 10)
      .as[(String, Long, Long, Long)].collect()
    val m = out.map(r => r._1 -> r).toMap
    assert(m("x") == (("x", 3L, 1L, flq(4) - flq(7) - (flq(2) - flq(7)))))
    assert(m("y")._4 == flq(2) - flq(1)) // present only in a: + drift
    assert(m("z")._4 == flq(1) - flq(4)) // present only in b: - drift
    // ranking: |z| = flq(4); |x| = flq(4)-flq(2) = ln2 ties |y| = flq(2),
    // broken by word order
    assert(out.map(_._1).toSeq == Seq("z", "x", "y"))
  }

  test("lmScore is partitioning-invariant (long sums carry no float order dependence)") {
    val docs = (0L until 200L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11}"))
      .toDF("doc_id", "text")
    def run(parts: Int) = TextAnalysis.lmScore(docs.repartition(parts), docs.repartition(parts))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(13), "1 partition vs 13 must be bit-identical")
  }

  test("importanceWeights/importanceScore: hand-derived DSIR log-ratios over hashed buckets") {
    def flq(n: Long): Long = math.floor(StrictMath.log(n.toDouble) * 1e6).toLong
    def bucket(bg: String, dim: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bg.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.take(15)
      Math.floorMod(java.lang.Long.parseLong(hex, 16), dim.toLong)
    }
    val dim = 64
    // target: one bigram (a b); raw: (a b) and (c d) -> N_t=1, N_r=2
    val target = Seq((0L, "a b")).toDF("doc_id", "text")
    val raw = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val bAb = bucket("a b", dim); val bCd = bucket("c d", dim); val bBc = bucket("b c", dim)
    assume(Set(bAb, bCd, bBc).size == 3, "fixture bigrams must not collide at dim=64")

    val w = TextAnalysis.importanceWeights(target, raw, dim)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(w.size == dim, "weight table is dense over all buckets")
    // seen in both: [flq(1+1) - flq(1+64)] - [flq(1+1) - flq(2+64)]
    assert(w(bAb) == ((bAb, 1L, 1L, (flq(2) - flq(65)) - (flq(2) - flq(66)))))
    // raw-only bucket: the negative-importance direction
    assert(w(bCd) == ((bCd, 0L, 1L, (flq(1) - flq(65)) - (flq(2) - flq(66)))))
    // unseen everywhere: smoothing-only weight, still present and nonzero
    assert(w(bBc) == ((bBc, 0L, 0L, (flq(1) - flq(65)) - (flq(1) - flq(66)))))

    val scored = TextAnalysis.importanceScore(
      Seq((10L, "a b c d"), (11L, "solo")).toDF("doc_id", "text"),
      TextAnalysis.importanceWeights(target, raw, dim), dim)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(scored(10L) == ((3L, w(bAb)._4 + w(bBc)._4 + w(bCd)._4)))
    assert(scored(11L) == ((0L, 0L)), "zero-bigram docs score (0, 0)")
    // the target-like bigram pulls importance up vs the raw-only one
    assert(w(bAb)._4 > w(bCd)._4)
  }

  test("c4LineFilter: every line rule and page flag fires on the hand fixture") {
    val docs = Seq(
      (0L, "Good long sentence with enough words here.\nshort one.\n" +
        "no punct line with many words\nuses javascript heavily on every page.\n" +
        "Another fine sentence with plenty of words too!"),
      (1L, "Lorem ipsum dolor sit amet and more words here.\n" +
        "Second proper sentence with enough words too."),
      (2L, "Brace page { with } but a fine sentence here.\n" +
        "Another quite fine long sentence right here."),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilter(docs, minWords = 5, minKeptLines = 2)
      .select("doc_id", "text_clean", "n_lines", "n_lines_kept", "c4_ok")
      .as[(Long, String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L,
      "Good long sentence with enough words here.\n" +
        "Another fine sentence with plenty of words too!", 5L, 2L, true)),
      "short, unpunctuated, and javascript lines drop; the rest rejoin")
    assert(out(1L)._4 == 2L && !out(1L)._5, "lorem ipsum fails the page despite kept lines")
    assert(out(2L)._4 == 2L && !out(2L)._5, "curly brace fails the page despite kept lines")
    assert(out(3L) == ((3L, "", 1L, 0L, false)), "empty page: one empty line, nothing kept")
  }

  test("gopherRules: each A1 rule fails its own fixture; integer decisions only") {
    val docs = Seq(
      (0L, "one two three four five six seven eight nine ten"), // clean -> ok
      (1L, "- a\n- b\n- c"),                                    // 100% bullet lines
      (2L, "good line number one...\nanother good line too...\n" +
        "plain good line here\nmore plain text line"),          // 50% ellipsis lines
      (3L, "alpha beta gamma delta epsilon # # # # ..."),       // symbol ratio 5/10
      (4L, "aa aa aa aa aa")                                    // mean word length 2 < 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, minWords = 5L, maxWords = 100L)
      .select("doc_id", "n_words", "word_chars", "n_symbols", "n_lines",
        "n_bullet_lines", "n_ellipsis_lines", "gopher_ok")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(0L)._8, "clean doc passes")
    assert(out(0L)._2 == 10L && out(0L)._3 == 39L)
    assert(out(1L)._6 == 3L && !out(1L)._8, "all-bullet page fails the 90% rule")
    assert(out(2L)._7 == 2L && out(2L)._5 == 4L && !out(2L)._8,
      "2 of 4 ellipsis-ending lines fails the 30% rule")
    assert(out(3L)._4 == 5L && !out(3L)._8, "4 hashes + 1 ellipsis vs 10 words fails 0.1")
    assert(out(4L)._2 == 5L && out(4L)._3 == 10L && !out(4L)._8,
      "mean word length 2 fails the cross-multiplied lower bound")
  }

  test("importanceScoreScan is bit-identical to the join form (including empty docs)") {
    val docs = ((0L until 200L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11}")) :+
      ((200L, "solo")) :+ ((201L, ""))).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") % 3 === 0)
    val w = TextAnalysis.importanceWeights(target, docs, 128)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(sorted(TextAnalysis.importanceScoreScan(docs, w, 128)) ==
      sorted(TextAnalysis.importanceScore(docs, w, 128)),
      "scan twin must reproduce the join form exactly")
  }

  test("importanceScore is partitioning-invariant and bounded by the dim-row broadcast") {
    val docs = (0L until 200L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11}"))
      .toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") % 3 === 0)
    def run(parts: Int) = TextAnalysis.importanceScore(
      docs.repartition(parts),
      TextAnalysis.importanceWeights(target.repartition(parts), docs.repartition(parts), 128), 128)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) == run(13), "1 partition vs 13 must be bit-identical")
  }

  test("filterAblation: every marginal equals the standalone filter; masses conserve") {
    // mixed fixture: an all-clean English page, a bullet-heavy page, a
    // blocklisted page, a mislabeled-language page, a too-short page
    val docs = Seq(
      (0L, "en", "The cat sat on the mat today and it was of good cheer to all friends.\nAnother perfectly fine sentence with plenty of good words to keep going."),
      (1L, "en", "- item one of the list\n- item two of the list\n- item three here"),
      (2L, "en", "This page mentions the badword once and the rest of it is long enough to pass."),
      (3L, "fr", "The declared language of this document is wrong since the text is English prose."),
      (4L, "en", "too short.")
    ).toDF("doc_id", "lang", "text")
    val m = TextAnalysis.filterAblation(docs, Seq("badword"),
      c4MinWords = 5, c4MinKeptLines = 1, gopherMinWords = 5L, gopherMaxWords = 50L).persist()

    assert(m.count() <= 32)
    assert(m.agg(sum(col("n_docs"))).first.getLong(0) == 5L)

    def marginal(flag: String): Long =
      m.filter(col(flag)).agg(coalesce(sum(col("n_docs")), lit(0L))).first.getLong(0)
    val c4 = TextAnalysis.c4LineFilter(docs, 5, 1).filter(col("c4_ok")).count()
    val gopher = TextAnalysis.gopherRules(docs, 5L, 50L).filter(col("gopher_ok")).count()
    val quality = TextAnalysis.qualityScore(docs).filter(col("quality_ok")).count()
    val bad = TextAnalysis.badwordsFilter(docs, Seq("badword")).filter(col("kept")).count()
    val langOk = TextAnalysis.languageId(docs)
      .filter(col("predicted_lang") === col("lang")).count()
    assert(marginal("c4_ok") == c4, "c4 marginal")
    assert(marginal("gopher_ok") == gopher, "gopher marginal")
    assert(marginal("quality_ok") == quality, "quality marginal")
    assert(marginal("badwords_ok") == bad, "badwords marginal")
    assert(marginal("lang_ok") == langOk, "lang marginal")

    // word mass = the gopher filtered word count, conserved across cells
    val words = TextAnalysis.gopherRules(docs, 5L, 50L)
      .agg(sum(col("n_words"))).first.getLong(0)
    assert(m.agg(sum(col("sum_words"))).first.getLong(0) == words)

    // the clean page passes everything; the mislabeled page fails ONLY lang
    assert(m.filter(col("c4_ok") && col("gopher_ok") && col("quality_ok") &&
      col("badwords_ok") && col("lang_ok")).agg(sum(col("n_docs"))).first.getLong(0) >= 1L)
    val onlyLang = m.filter(col("c4_ok") && col("gopher_ok") && col("quality_ok") &&
      col("badwords_ok") && !col("lang_ok"))
    assert(onlyLang.agg(coalesce(sum(col("n_docs")), lit(0L))).first.getLong(0) >= 1L)
    m.unpersist()
  }

  test("filterAblation: one corpus scan, one shuffle — the five filters compose scan-stage") {
    val df = Seq((0L, "en", "a few words here to score.")).toDF("doc_id", "lang", "text")
    val plan = TextAnalysis.filterAblation(df, Seq("x"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"exactly one shuffle (the <=32-row groupBy):\n$plan")
    assert(!plan.contains("Join"), s"no join anywhere:\n$plan")
  }
}
