package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeywordCollocationSpec extends SparkSpec {
  import spark.implicits._

  // lnq constants for the hand-derived fixtures
  private def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong

  test("tfidf top terms: hand-derived scores, ranks, and tie-break by term") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "apple cherry cherry date")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, topK = 2)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._6) -> ((r._2, r._5))).toMap
    val idf2 = lnq(3) - lnq(2) // df=2 terms
    val idf1 = lnq(3) - lnq(1) // df=1 terms
    assert(got((0L, 1L)) == (("apple", 2 * idf2)))
    assert(got((0L, 2L)) == (("banana", idf2)))
    // d1: banana and cherry tie at 1·idf2 — term asc breaks it
    assert(got((1L, 1L)) == (("banana", idf2)))
    assert(got((1L, 2L)) == (("cherry", idf2)))
    // d2: the rare word beats the frequent one
    assert(got((2L, 1L)) == (("date", idf1)))
    assert(got((2L, 2L)) == (("cherry", 2 * idf2)))
  }

  test("tfidf: corpus-universal term scores exactly zero; minDf drops singletons") {
    val docs = Seq((0L, "the apple"), (1L, "the banana"), (2L, "the cherry"))
      .toDF("doc_id", "text")
    val all = TextAnalysis.tfidfTopTerms(docs, topK = 5)
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(all.filter(_._2 == "the").forall(_._5 == 0L)) // df = N ⇒ score_q = 0
    val cut = TextAnalysis.tfidfTopTerms(docs, topK = 5, minDf = 2L)
      .select("term").as[String].collect().toSet
    assert(cut == Set("the")) // singletons gone
  }

  test("pmi collocations: hand-derived discounted score and minCount gate") {
    val docs = Seq((0L, "new york a"), (1L, "new york b"), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, minCount = 2, discount = 1)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length == 1) // only (new, york) reaches minCount
    val (w1, w2, cab, ca, cb, q) = got.head
    assert((w1, w2, cab, ca, cb) == (("new", "york", 2L, 2L, 2L)))
    assert(q == lnq(1) + lnq(8) - lnq(2) - lnq(2)) // (2−δ)·8/(2·2), quantized
  }

  test("pmi: collocation outranks an equally-frequent but independent pair") {
    // "tick tock" always adjacent; "aa"/"bb" frequent but never adjacent
    val docs = Seq(
      (0L, "tick tock aa x bb"), (1L, "tick tock bb y aa"),
      (2L, "aa z bb tick tock"), (3L, "bb w aa tick tock")).toDF("doc_id", "text")
    val rows = TextAnalysis.pmiCollocations(docs, minCount = 2, discount = 1, topK = 5)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.head._1 == "tick" && rows.head._2 == "tock")
  }
}
