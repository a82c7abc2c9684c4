package graft.operators

import graft.SparkSpec

class HeapsSpec extends SparkSpec {
  import spark.implicits._

  test("pure power-law vocabulary growth recovers its exponent") {
    // construct docs where cumulative vocab V(n) = n^0.5 exactly at each
    // bucket boundary: doc d contributes 16 tokens; new words per doc
    // chosen so V after doc d is round(sqrt(16(d+1)))
    val tokensPerDoc = 16
    var vocabSoFar = 0
    val docs = (0 until 256).map { d =>
      val targetV = math.round(math.sqrt(16.0 * (d + 1))).toInt
      val newWords = (vocabSoFar until targetV).map(i => s"w$i")
      vocabSoFar = targetV
      val filler = Seq.fill(tokensPerDoc - newWords.size)("w0")
      (d.toLong, (newWords ++ filler).mkString(" "))
    }
    val got = TextAnalysis.heapsFit(docs.toDF("doc_id", "text"), sampleEvery = 8L)
      .select("n_points", "beta").as[(Long, Double)].head()
    assert(got._1 == 32L)
    assert(math.abs(got._2 - 0.5) < 0.03, s"beta ${got._2} should be ~0.5")
  }

  test("closed vocabulary flattens toward beta 0") {
    val docs = (0 until 128).map(d => (d.toLong, Seq.fill(10)(s"w${d % 5}").mkString(" ")))
    val beta = TextAnalysis.heapsFit(docs.toDF("doc_id", "text"), sampleEvery = 4L)
      .select("beta").as[Double].head()
    assert(beta < 0.1, s"beta $beta for a 5-word vocabulary")
  }
}
