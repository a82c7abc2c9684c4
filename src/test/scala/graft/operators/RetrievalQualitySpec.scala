package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RRF hybrid-search fusion, Gopher duplicate-segment filters, and the
  * LZ76 compression-density signal.
  */
class RetrievalQualitySpec extends SparkSpec {
  import spark.implicits._

  // ---- reciprocal-rank fusion --------------------------------------

  test("rrfFuse: id in both lists outranks single-list ids; scores are exact integer sums") {
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((12L, 1L), (13L, 2L)).toDF("doc_id", "rank")
    val out = Ann.rrfFuse(Seq(lex, sem), k0 = 60, topK = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lists"), r.getAs[Long]("rrf_q"), r.getAs[Long]("rank")))).toMap
    def c(rank: Long) = 1000000000000L / (rank + 60L)
    // doc 12: rank 3 lexical + rank 1 semantic — beats everyone
    assert(out(12L) == ((2L, c(3) + c(1), 1L)))
    assert(out(10L) == ((1L, c(1), 2L)))
    assert(out(11L) == ((1L, c(2), 3L))) // ties with 13 on score; smaller id first
    assert(out(13L) == ((1L, c(2), 4L)))
  }

  test("rrfFuse: topK truncates after fusion, not per list") {
    val a = (1L to 30L).map(i => (i, i)).toDF("doc_id", "rank")
    val b = (1L to 30L).map(i => (100L + i, i)).toDF("doc_id", "rank")
    val out = Ann.rrfFuse(Seq(a, b), k0 = 60, topK = 5).collect()
    assert(out.length == 5)
    // rank-1 of each list tie on score; smaller id first
    assert(out.map(_.getAs[Long]("doc_id")).take(2).toSeq == Seq(1L, 101L))
  }

  // ---- MMR diversity re-ranking ------------------------------------

  test("recallEval: probe whose true neighbor sits in an unprobed cell scores below 1") {
    // cells seeded by ids 0=(1,0) and 1=(0,1); vector 4=(0.7,0.7) ties on
    // cosine and lands in cell 0 (tie → lowest id). Probe 3 lives in cell 1,
    // its true top-2 is {1, 4} — but nprobe=1 only searches cell 1, so the
    // index returns {1} alone: hits 1, recall 0.5. Probe 0's true top-2
    // {2, 4} is entirely inside cell 0: recall 1.
    val emb = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f),
      4L -> Seq(0.7f, 0.7f)).toDF("vec_id", "embedding")
    val out = Ann.recallEval(emb.filter(col("vec_id").isin(0L, 3L)), emb,
      k = 2, nlist = 2, nprobe = 1)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        ((r.getAs[Long]("hits"), r.getAs[Double]("recall")))).toMap
    assert(out(0L) == ((2L, 1.0)))
    assert(out(3L) == ((1L, 0.5)))
    // and with nprobe=2 every cell is searched: recall recovers to 1
    val full = Ann.recallEval(emb.filter(col("vec_id").isin(0L, 3L)), emb,
      k = 2, nlist = 2, nprobe = 2)
      .collect().map(r => r.getAs[Double]("recall"))
    assert(full.forall(_ == 1.0))
  }

  test("ndcgEval: perfect probe scores 1.0; the probe missing its rank-2 truth pays the graded loss") {
    // same geometry as the recall fixture: probe 0's IVF list equals its
    // truth list; probe 3's list finds only truth-rank-1 (neighbor 1)
    val emb = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f),
      4L -> Seq(0.7f, 0.7f)).toDF("vec_id", "embedding")
    def wq(r: Long): Long = 1000000000000L / math.floor(math.log(r + 1.0) / math.log(2.0) * 1e6).toLong
    val out = Ann.ndcgEval(emb.filter(col("vec_id").isin(0L, 3L)), emb,
      k = 2, nlist = 2, nprobe = 1)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        ((r.getAs[Long]("dcg_q"), r.getAs[Long]("idcg_q"), r.getAs[Double]("ndcg")))).toMap
    val idcg = 2L * wq(1) + 1L * wq(2)
    assert(out(0L) == ((idcg, idcg, 1.0)))
    // probe 3: only its truth-#1 returned, at position 1 → dcg = 2·w(1)
    assert(out(3L) == ((2L * wq(1), idcg, (2L * wq(1)).toDouble / idcg.toDouble)))
    assert(out(3L)._3 < 1.0)
  }

  test("dimAblationRecall: front-loaded signal keeps recall 1, back-loaded signal loses it") {
    import org.apache.spark.sql.DataFrame
    // 4-dim corpus; probe 0's true neighbors differ in WHICH half carries signal
    def run(corpus: Seq[(Long, Seq[Float])]): Map[Long, (Long, Double)] =
      Ann.dimAblationRecall(
        corpus.toDF("vec_id", "embedding").filter(col("vec_id") < 1): DataFrame,
        corpus.toDF("vec_id", "embedding"), k = 2, dims = 2)
        .select("probe_id", "hits", "recall").as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // signal in the first two dims: truncation changes nothing
    val front = Seq(
      0L -> Seq(1.0f, 0.1f, 0.0f, 0.0f), 1L -> Seq(1.0f, 0.12f, 0.0f, 0.0f),
      2L -> Seq(0.9f, 0.1f, 0.0f, 0.0f), 3L -> Seq(-1.0f, 0.5f, 0.0f, 0.0f))
    assert(run(front)(0L) == ((2L, 1.0)))
    // neighbors distinguished ONLY by the last two dims: ablated search
    // sees identical prefixes and ranks by id, losing the true top-2
    val back = Seq(
      0L -> Seq(1.0f, 0.0f, 1.0f, 0.5f), 1L -> Seq(1.0f, 0.0f, -1.0f, 0.4f),
      2L -> Seq(1.0f, 0.0f, -0.9f, -0.6f), 3L -> Seq(1.0f, 0.0f, 0.98f, 0.52f))
    val got = run(back)(0L)
    assert(got._1 < 2L && got._2 < 1.0)
  }

  test("mmrRerank: a near-duplicate of the top hit is deferred; pure relevance keeps it") {
    // candidates: 10 ≅ 11 (near-identical vectors), 12 orthogonal-ish
    val pool = Seq(
      (10L, 990000L, Seq(1.0f, 0.0f, 0.1f)),
      (11L, 980000L, Seq(1.0f, 0.01f, 0.1f)), // clone of 10, slightly less relevant
      (12L, 900000L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "rel_q", "embedding")
    val diverse = Ann.mmrRerank(pool, k = 3, lambdaBp = 7000).collect()
      .map(r => r.getAs[Long]("rank") -> r.getAs[Long]("vec_id")).toMap
    assert(diverse == Map(1L -> 10L, 2L -> 12L, 3L -> 11L),
      "the clone must fall behind the orthogonal hit under the diversity penalty")
    val pure = Ann.mmrRerank(pool, k = 3, lambdaBp = 10000).collect()
      .map(r => r.getAs[Long]("rank") -> r.getAs[Long]("vec_id")).toMap
    assert(pure == Map(1L -> 10L, 2L -> 11L, 3L -> 12L),
      "lambda = 1 must reduce to pure relevance order")
  }

  test("mmrRerank: first pick is max relevance (id ties) and k caps the output") {
    val pool = Seq(
      (5L, 500000L, Seq(1.0f, 0.0f)),
      (3L, 500000L, Seq(0.0f, 1.0f)),
      (9L, 400000L, Seq(1.0f, 1.0f))
    ).toDF("vec_id", "rel_q", "embedding")
    val out = Ann.mmrRerank(pool, k = 2, lambdaBp = 7000).collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("vec_id") == 3L, "equal top relevance: smaller id wins")
    assert(out.head.getAs[Long]("mmr_q") == 7000L * 500000L, "first pick has no sim penalty")
  }

  // ---- duplicate line / paragraph metrics --------------------------

  test("duplicateSegmentMetrics: hand fixture counts slots and chars beyond first occurrences") {
    // lines: [aa, bb, aa, cc] -> 1 dup slot, 2 dup chars of 8
    // paras: [aa\nbb, aa\ncc] -> 0 dups
    val df = Seq((0L, "aa\nbb\n\naa\ncc")).toDF("doc_id", "text")
    val r = TextAnalysis.duplicateSegmentMetrics(df).collect().head
    assert(r.getAs[Long]("n_lines") == 4 && r.getAs[Long]("n_dup_lines") == 1)
    assert(r.getAs[Long]("line_chars") == 8 && r.getAs[Long]("dup_line_chars") == 2)
    assert(r.getAs[Long]("n_paras") == 2 && r.getAs[Long]("n_dup_paras") == 0)
    assert(r.getAs[Double]("dup_line_frac") == 0.25)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.25)
    // line count frac 0.25 passes 0.30, but char frac 0.25 > 0.20 — gated
    assert(!r.getAs[Boolean]("dup_ok"))
  }

  test("duplicateSegmentMetrics: published thresholds gate both granularities") {
    val clean = "one\ntwo\nthree\nfour\nfive"
    val dupLines = "same line\nsame line\nsame line\nother"     // 2/4 = 0.5 > 0.30
    val dupParas = "para a\n\npara a\n\npara b"                  // 1/3 = 0.33 > 0.30
    val df = Seq((0L, clean), (1L, dupLines), (2L, dupParas)).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSegmentMetrics(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("dup_ok")).toMap
    assert(out(0L) && !out(1L) && !out(2L))
  }

  test("duplicateSegmentMetrics stays scan-only — no exchange in the plan") {
    val df = Seq((0L, "a\nb")).toDF("doc_id", "text")
    val plan = TextAnalysis.duplicateSegmentMetrics(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("charEntropy stays scan-only — no exchange in the plan") {
    val df = Seq((0L, "abab")).toDF("doc_id", "text")
    val plan = TextAnalysis.charEntropy(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- LZ76 compression density ------------------------------------

  test("Lz76PhraseCount: hand-parsed fixtures (convention matches Metrics.lzComplexity)") {
    val cases = Seq(
      "aaaa" -> 2L,      // a | aaa (overlapping source)
      "abab" -> 3L,      // a | b | ab
      "abcabcabc" -> 4L, // a | b | c | abcabc
      "abcd" -> 4L,      // no repeats: every char a phrase
      "a" -> 1L)
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.lzDensity(df, maxChars = 120).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_phrases")).toMap
    cases.zipWithIndex.foreach { case ((t, want), i) =>
      assert(out(i.toLong) == want, s"'$t' expected $want got ${out(i.toLong)}")
    }
  }

  test("lzDensity: maxChars caps the parse and lz_q is the integer density") {
    val df = Seq((0L, "abcabcabc")).toDF("doc_id", "text")
    val r = TextAnalysis.lzDensity(df, maxChars = 4).collect().head
    // "abca": a | b | c | a -> 4 phrases over 4 chars
    assert(r.getAs[Long]("n_chars_scanned") == 4)
    assert(r.getAs[Long]("n_phrases") == 4)
    assert(r.getAs[Long]("lz_q") == 4L * 1000000L / 4L)
  }

  test("Lz76PhraseCount equals a naive reference on random small-alphabet strings") {
    def naive(s: String): Long = {
      val a = s.codePoints().toArray
      val n = a.length
      var p = 0; var c = 0L
      while (p < n) {
        var best = 0
        for (q <- 0 until p) {
          var l = 0
          while (l < n - p && a(q + l) == a(p + l)) l += 1
          if (l > best) best = l
        }
        p += math.min(best + 1, n - p); c += 1L
      }
      c
    }
    val rnd = new scala.util.Random(7)
    val texts = (0 until 40).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(60))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val out = TextAnalysis.lzDensity(texts.toDF("doc_id", "text"), maxChars = 120).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_phrases")).toMap
    texts.foreach { case (id, t) => assert(out(id) == naive(t), s"'$t'") }
  }

  test("lz76_phrase_count is registered as a SQL function") {
    graft.plans.GraftExtensions.register(spark)
    val out = Seq(("abcabcabc", 1)).toDF("text", "one")
      .selectExpr("lz76_phrase_count(text, 120) AS p", "lz76_phrase_count(text, 4) AS p4")
      .collect().head
    assert(out.getLong(0) == 4L && out.getLong(1) == 4L)
  }

  test("lzDensity: repetitive text scores lower density than varied text, plan scan-only") {
    val df = Seq(
      (0L, "spam spam spam spam spam spam spam spam"),
      (1L, "the quick brown fox jumps over lazy dogs")).toDF("doc_id", "text")
    val q = TextAnalysis.lzDensity(df)
    val out = q.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lz_q")).toMap
    assert(out(0L) < out(1L))
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
