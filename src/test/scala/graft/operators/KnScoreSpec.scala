package graft.operators

import graft.SparkSpec

/** [[TextAnalysis.knScore]]: interpolated bigram Kneser-Ney on the
  * rational D = 3/4 formulation, hand-computed on paper-sized fixtures.
  */
class KnScoreSpec extends SparkSpec {
  import spark.implicits._

  private def lnq(x: Double): Long = math.floor(math.log(x) * 1e6).toLong

  test("hand-computed seen-context, unseen-bigram and clamp paths") {
    // train (doc 1): "a b a c" -> bigrams (a,b),(b,a),(a,c); D2=3
    // contexts: a(c1=2,n1f=2), b(c1=1,n1f=1); continuations: a,b,c = 1
    // holdout (doc 4): "a b x"
    //  (a,b): num = max(4-3,0)*3 + 3*2*1 = 9,  den = 4*2*3 = 24
    //  (b,x): num = 0 + 3*1*0 = 0 (clamped to 1, n_zero), den = 4*1*3 = 12
    val docs = Seq((1L, "s", "a b a c"), (4L, "s", "a b x"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.knScore(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_bigrams") == 2L)
    assert(row.getAs[Long]("n_zero") == 1L)
    val expected = (lnq(24) - lnq(9)) + (lnq(12) - lnq(1))
    assert(row.getAs[Long]("nll_q") == expected)
    assert(math.abs(row.getAs[Double]("nll_nats") - expected / 2e6) < 1e-12)
  }

  test("unseen context backs off to pure continuation probability") {
    // holdout bigram (zzz, a): zzz never a train context ->
    // p = N1+(.a)/D2 = 1/3 -> nll = lnq(3) - lnq(1)
    val docs = Seq((1L, "s", "a b a c"), (4L, "s", "zzz a"))
      .toDF("doc_id", "source", "text")
    val row = TextAnalysis.knScore(docs).collect().head
    assert(row.getAs[Long]("n_bigrams") == 1L)
    assert(row.getAs[Long]("n_zero") == 0L)
    assert(row.getAs[Long]("nll_q") == lnq(3) - lnq(1))
  }

  test("groups aggregate independently and train pools across sources") {
    val docs = Seq(
      (1L, "s1", "a b a c"),          // train
      (4L, "s1", "a b"),              // holdout s1: (a,b) -> 9/24
      (8L, "s2", "a b a b"))          // holdout s2: (a,b),(b,a),(a,b)
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.knScore(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("nll_q")).toMap
    val ab = lnq(24) - lnq(9)
    // (b,a): num = max(4-3,0)*3 + 3*1*1 = 6, den = 4*1*3 = 12
    val ba = lnq(12) - lnq(6)
    assert(got("s1") == ab)
    assert(got("s2") == 2 * ab + ba)
  }
}
