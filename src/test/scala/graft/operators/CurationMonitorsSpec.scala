package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationMonitorsSpec extends SparkSpec {
  import spark.implicits._

  test("dedup rate per group: cloned source shows the drop, clean source shows zero") {
    val docs = (
      (0 until 6).map(i => (i.toLong, "copied text payload one two three four five six", "cloned")) ++
      (0 until 6).map(i => (10L + i, s"unique document number $i with its own words entirely", "clean")))
      .toDF("doc_id", "text", "source")
    val pairs = Dedup.minHashLsh(docs, numHashes = 64, bands = 16, verifyThreshold = 0.5)
    val got = Dedup.dedupRateByGroup(docs, pairs)
      .select("source", "n_docs", "n_dropped").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("cloned") == ((6L, 5L))) // one keeper survives the 6-clone family
    assert(got("clean") == ((6L, 0L)))
  }

  test("gini: hand-computed inequality for a skewed mix, zero for a uniform one") {
    // skewed lang: source counts 1, 1, 2, 4 -> G = (2*25 - 5*8) / (4*8)
    val docs = (
      Seq((0L, "a")) ++ Seq((1L, "b")) ++ (0 until 2).map(i => (2L + i, "c")) ++
        (0 until 4).map(i => (4L + i, "d"))).map { case (id, src) => (id, "en", src) } ++
      (0 until 6).map(i => (100L + i, "de", s"s${i % 3}")) // uniform: 2 each of 3 sources
    val got = CorpusOps.gini(docs.toDF("doc_id", "lang", "source"))
      .select("lang", "n_sources", "n_docs", "gini")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 4L, 8L, (2.0 * 25 - 5 * 8) / (4.0 * 8))))
    assert(got("de") == (("de", 3L, 6L, 0.0)))
  }

  test("scoreJointDeciles: identical scores land on the diagonal, reversed on the anti-diagonal") {
    val docs = Seq((0L, 10L, "x"), (1L, 20L, "x x x"), (2L, 30L, "x x x x x x"),
      (3L, 40L, "x x x x x x x x"))
      .toDF("doc_id", "a", "text")
      .withColumn("b", size(split(col("text"), " ")).cast("long"))
    val same = CorpusOps.scoreJointDeciles(docs, "a", "b")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // a-pcts 0,2500,5000,7500 -> deciles 0,2,5,7; b is monotone in a
    assert(same == Map((0L, 0L) -> 1L, (2L, 2L) -> 1L, (5L, 5L) -> 1L, (7L, 7L) -> 1L))
    val rev = CorpusOps.scoreJointDeciles(docs.withColumn("b", lit(100L) - col("a")), "a", "b")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(rev == Map((0L, 7L) -> 1L, (2L, 5L) -> 1L, (5L, 2L) -> 1L, (7L, 0L) -> 1L))
  }

  test("jaccardCalibration: floor buckets with order-independent min/max bounds") {
    val pairs = Seq(
      (1L, 2L, 0.5), (3L, 4L, 0.52), (5L, 6L, 0.95), (7L, 8L, 1.0))
      .toDF("id_a", "id_b", "jaccard")
    val got = Dedup.jaccardCalibration(pairs)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      10L -> ((2L, 0.5, 0.52)), 19L -> ((1L, 0.95, 0.95)), 20L -> ((1L, 1.0, 1.0))))
  }

  test("langConfusion: off-diagonal cell for a mislabeled doc, diagonal for a correct one") {
    val docs = Seq(
      (0L, "the a of and to the a", "en"),   // detected en, declared en
      (1L, "the a of and to the a", "de"))   // detected en, declared de
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langConfusion(docs)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("en", "en") -> 1L, ("de", "en") -> 1L))
  }

  test("tokenBudgetCurve: descending cumulative token mass over percentile buckets") {
    // scores 10,20,20,30 -> pct 0,2500,2500,7500 -> buckets 0,25,25,75
    val docs = Seq(
      (0L, "en", 10L, "a"), (1L, "en", 20L, "b b"), (2L, "en", 20L, "c c c"),
      (3L, "en", 30L, "d d d d"))
      .toDF("doc_id", "lang", "score", "text")
    val got = CorpusOps.tokenBudgetCurve(docs, "score")
      .select("bucket", "n_docs", "n_tokens", "cum_docs", "cum_tokens", "token_share")
      .as[(Long, Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(75L) == ((75L, 1L, 4L, 1L, 4L, 0.4)))
    assert(got(25L) == ((25L, 2L, 5L, 3L, 9L, 0.9)))
    assert(got(0L) == ((0L, 1L, 1L, 4L, 10L, 1.0)))
  }

  test("percentileRank: strictly-below ranks with shared ties, per group") {
    val docs = Seq(
      (0L, "en", 10L), (1L, "en", 20L), (2L, "en", 20L), (3L, "en", 30L),
      (10L, "de", 5L), (11L, "de", 7L))
      .toDF("doc_id", "lang", "n_chars")
    val got = CorpusOps.percentileRank(docs, "n_chars")
      .select("doc_id", "lang", "value", "pct_bp")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, "en", 10L, 0L)))
    assert(got(1L) == ((1L, "en", 20L, 2500L)) && got(2L) == ((2L, "en", 20L, 2500L)))
    assert(got(3L) == ((3L, "en", 30L, 7500L)))
    assert(got(10L) == ((10L, "de", 5L, 0L)) && got(11L) == ((11L, "de", 7L, 5000L)))
  }

  test("scoreCorrelation: identical order gives spearman 1, reversed gives -1, ties stay deterministic") {
    val n = 40
    val docs = (0 until n).map { i =>
      (i.toLong, 10L + i / 2, 1000L - (10L + i / 2)) // paired ties in both scores
    }.toDF("doc_id", "a", "b")
    val up = CorpusOps.scoreCorrelation(docs.withColumn("b2", col("a") * 2), "a", "b2", partitions = 7)
      .select("n_docs", "pearson", "spearman").as[(Long, Double, Double)].collect().head
    assert(up._1 == n.toLong && up._3 == 1.0 && math.abs(up._2 - 1.0) < 1e-12)
    val down = CorpusOps.scoreCorrelation(docs, "a", "b", partitions = 7)
      .select("n_docs", "pearson", "spearman").as[(Long, Double, Double)].collect().head
    // b = 1000 - a: value-reversed, but rank ties break by doc_id on BOTH
    // sides, so tied pairs keep their id order: spearman is near -1, not
    // exactly -1 (d^2 replay below is the exact contract)
    val ranksA = docs.select("doc_id", "a").as[(Long, Long)].collect()
      .sortBy(t => (t._2, t._1)).zipWithIndex.map { case ((id, _), r) => id -> (r + 1L) }.toMap
    val ranksB = docs.select("doc_id", "b").as[(Long, Long)].collect()
      .sortBy(t => (t._2, t._1)).zipWithIndex.map { case ((id, _), r) => id -> (r + 1L) }.toMap
    val sdd = (0 until n).map { i =>
      val d = ranksA(i.toLong) - ranksB(i.toLong); d * d
    }.sum
    val expect = 1.0 - 6.0 * sdd.toDouble / (n.toLong * n * n - n).toDouble
    assert(down._3 == expect && expect < -0.99)
    assert(math.abs(down._2 + 1.0) < 1e-12)
  }

  test("grouped weighted sample takes exactly k per group and matches the global priorities") {
    val docs = (0 until 60).map(i => (i.toLong, s"t$i", if (i % 2 == 0) "en" else "de", 10L + i))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = CorpusOps.weightedSampleByGroup(docs, kPerGroup = 4, weightCol = "n_chars")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.groupBy(_._2).forall(_._2.length == 4))
    // per-group winners = the global priority order restricted to the group
    val global = CorpusOps.weightedSample(docs, k = 60, weightCol = "n_chars")
      .select("doc_id", "lang", "priority_q").as[(Long, String, Long)].collect()
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val expect = global.filter(_._2 == lang).sortBy(r => (r._3, r._1)).take(4).map(_._1).toSet
      assert(rows.map(_._1).toSet == expect, s"group $lang")
    }
  }

  test("grouped sampling plans a WindowGroupLimit (rank stops materializing past k)") {
    val docs = (0 until 100).map(i => (i.toLong, "t", "en", 10L + i))
      .toDF("doc_id", "text", "lang", "n_chars")
    val plan = CorpusOps.weightedSampleByGroup(docs, kPerGroup = 3, weightCol = "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("filtered ANN is the true top-k of the filtered set (pre-filter semantics)") {
    def vec(seed: Int) = (0 until 8).map(d => math.sin(seed * 7.0 + d).toFloat)
    val embs = (0 until 40).map(i => (i.toLong, vec(i), (i % 3)))
      .toDF("vec_id", "embedding", "label")
    val got = Ann.filteredTopK(embs.filter(col("vec_id") < 3), embs, labelValue = 1L, k = 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n) => assert(n % 3 == 1, s"neighbor $n escaped the label filter") }
    assert(got.groupBy(_._1).forall(_._2.length == 5)) // pre-filter: full k from the 13 label-1 rows
  }

  test("containmentPairs: a document embedded in a larger host is caught where Jaccard dilutes") {
    val quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val host = s"intro words before the quoted body $quote and a long tail of extra " +
      "unrelated commentary stretching the host document much further onward " +
      "with more and more filler terms diluting the union"
    val docs = Seq((1L, quote), (2L, host), (3L, "completely different content here entirely"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, numHashes = 64, bands = 32, threshold = 0.8)
      .as[(Long, Long, Double, Double)].collect()
    assert(cont.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L)))
    val (_, _, ca, cb) = cont.head
    assert(ca >= 0.8, s"containment quote->host $ca") // quote fully inside host
    assert(cb < 0.8, s"host side dilutes: $cb")
    // symmetric Jaccard on the same pair would miss it at this bar
    val jac = Dedup.minHashLsh(docs, numHashes = 64, bands = 32, verifyThreshold = 0.8)
    assert(jac.count() == 0L)
  }

  test("packingEfficiency: exact bins, basis-point fill, and oversize count") {
    // group g: docs of 3, 3, 5 tokens at budget 6 -> bins [3+3], [5]
    // group h: one 9-token doc (oversize) and one 2-token doc
    val docs = Seq(
      (1L, "a b c", "g"), (2L, "d e f", "g"), (3L, "p q r s t", "g"),
      (4L, "one two three four five six seven eight nine", "h"), (5L, "x y", "h"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusOps.packingEfficiency(
      CorpusOps.packSequences(docs, budgetTokens = 6L), budgetTokens = 6L)
      .select("lang", "n_docs", "n_bins", "sum_tokens", "n_oversize", "fill_bp")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("g") == ((3L, 2L, 11L, 0L, 10000L * 11 / 12)))
    assert(out("h") == ((2L, 2L, 11L, 1L, 10000L * 11 / 12)))
  }

  test("splitLeakage: pair counts per canonical split combo match a brute-force replay") {
    val docs = (0 until 40).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L), (8L, 9L), (10L, 11L))
      .toDF("id_a", "id_b")
    val split = CorpusOps.hashSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val expect = Seq((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L), (8L, 9L), (10L, 11L))
      .map { case (a, b) =>
        val ss = Seq(split(a), split(b)).sorted; (ss(0), ss(1)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Dedup.splitLeakage(docs, pairs)
      .select("split_1", "split_2", "n_pairs", "is_leak")
      .as[(String, String, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == expect)
    got.foreach { r => assert(r._4 == (if (r._1 != r._2) 1L else 0L)) }
    assert(got.map(_._3).sum == 6L) // every pair lands in exactly one combo
  }
}
