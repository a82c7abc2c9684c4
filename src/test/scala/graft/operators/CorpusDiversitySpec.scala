package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusDiversitySpec extends SparkSpec {
  import spark.implicits._

  test("termBurstiness: bursty content word separates from an evenly-spread function word") {
    val docs = Seq(
      (0L, "the cat zap zap zap zap"),
      (1L, "the dog"),
      (2L, "the bird")).toDF("doc_id", "text")
    val got = TextAnalysis.termBurstiness(docs, topK = 2)
      .select("rank", "word", "cf", "df", "burstiness")
      .as[(Long, String, Long, Long, Double)].collect().map(r => r._2 -> r).toMap
    // zap: cf 4 in one doc -> burstiness 4; the: cf 3 across 3 docs -> 1
    assert(got("zap") == ((1L, "zap", 4L, 1L, 4.0)))
    assert(got("the") == ((2L, "the", 3L, 3L, 1.0)))
  }

  test("sourceOverlap: syndicated copy shows full overlap, disjoint feeds none") {
    val docs = Seq(
      (0L, "alpha beta gamma delta", "wire"),
      (1L, "alpha beta gamma delta", "mirror"),   // exact syndication of wire
      (2L, "one two three four five", "fresh"))   // disjoint
      .toDF("doc_id", "text", "source")
    val got = CorpusOps.sourceOverlap(docs, n = 3)
      .select("source_a", "source_b", "n_common", "n_a", "n_b", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // "alpha beta gamma delta" has 2 distinct trigrams, fully shared
    assert(got(("mirror", "wire")) == (("mirror", "wire", 2L, 2L, 2L, 1.0)))
    // disjoint pairs never appear (inner join on shared grams)
    assert(!got.contains(("fresh", "wire")) && !got.contains(("fresh", "mirror")))
    assert(got.size == 1)
  }

  test("ngram diversity: repeated text scores low, unique text scores 1.0") {
    val docs = Seq(
      ("rep", "a b c a b c a b c a b c"),   // 10 trigram positions, 3 distinct... (cyclic)
      ("uniq", "q w e r t y u i o p")).toDF("source", "text")
    val got = TextAnalysis.ngramDiversity(docs, n = 3)
      .select("source", "n_grams", "n_distinct", "diversity")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("uniq")._4 == 1.0)
    assert(got("rep")._2 == 10L && got("rep")._3 == 3L) // abc, bca, cab
    assert(math.abs(got("rep")._4 - 0.3) < 1e-12)
  }

  test("length histogram buckets by floor(log2 n) with exact token sums") {
    val docs = Seq(
      ("s", Seq.fill(1)("w").mkString(" ")),   // n=1  -> bucket 0
      ("s", Seq.fill(3)("w").mkString(" ")),   // n=3  -> bucket 1
      ("s", Seq.fill(3)("w").mkString(" ")),
      ("s", Seq.fill(9)("w").mkString(" ")))   // n=9  -> bucket 3
      .toDF("source", "text")
    val got = TextAnalysis.lengthHistogram(docs)
      .select("bucket", "n_docs", "n_tokens", "bucket_lo")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 1L, 1L), (1L, 2L, 6L, 2L), (3L, 1L, 9L, 8L)))
  }

  test("boilerplate share counts positions covered by cross-doc repeated grams") {
    // "nav bar" appears in 3 of 3 docs of source s; fillers are unique
    val docs = Seq(
      (1L, "s", "nav bar x1 y1"),
      (2L, "s", "nav bar x2 y2"),
      (3L, "s", "nav bar x3 y3"),
      (4L, "t", "nav bar x4 y4")) // different group: below its own minDocs
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.boilerplateShare(docs, n = 2, minDocs = 3)
      .select("doc_id", "n_grams", "n_boiler").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // each doc: 3 bigram positions; only "nav bar" crosses minDocs in s
    assert(got(1L) == ((3L, 1L)) && got(2L) == ((3L, 1L)) && got(3L) == ((3L, 1L)))
    assert(got(4L) == ((3L, 0L)))
  }

  test("boilerplate join keeps the filtered gram set on the build side") {
    val docs = (0 until 60).map(i => (i.toLong, "s", s"nav bar w$i w${i + 1}"))
      .toDF("doc_id", "source", "text")
    val plan = TextAnalysis.boilerplateShare(docs, n = 2, minDocs = 3)
      .queryExecution.executedPlan.toString
    // equi-join, never a nested-loop product
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
