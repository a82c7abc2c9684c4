package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainerHandoffSpec extends SparkSpec {
  import spark.implicits._

  test("negative samples are deterministic, in-range, never self, never missing ids") {
    val docs = (0L until 50L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val a = CorpusOps.negativeSamples(docs, k = 4).as[(Long, Long, Long)].collect().toSet
    val b = CorpusOps.negativeSamples(docs, k = 4).as[(Long, Long, Long)].collect().toSet
    assert(a == b) // deterministic
    assert(a.forall { case (id, _, neg) => neg != id && neg >= 0 && neg < 50 })
    // attempted-k: close to k per doc (self-hits dropped, ~1/50 loss)
    val perDoc = a.groupBy(_._1).view.mapValues(_.size)
    assert(perDoc.values.forall(n => n >= 2 && n <= 4))
    assert(a.size > 50 * 3) // >3 average survivors
  }

  test("negative samples skip holes in a sparse id space") {
    val docs = Seq(0L, 1L, 2L, 7L, 11L).map(i => (i, "t")).toDF("doc_id", "text")
    val got = CorpusOps.negativeSamples(docs, k = 8).as[(Long, Long, Long)].collect()
    val valid = Set(0L, 1L, 2L, 7L, 11L)
    assert(got.forall(r => valid.contains(r._3) && r._3 != r._1))
  }

  test("oov rate against the corpus top-K vocabulary") {
    // vocab of size 2 will be {a, b}; source t is fully OOV except 'a'
    val docs = Seq(
      ("s", "a a a b b"),
      ("t", "a z q")).toDF("source", "text")
    val got = TextAnalysis.oovRate(docs, vocabSize = 2)
      .select("source", "n_tokens", "n_oov")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("s" -> ((5L, 0L)), "t" -> ((3L, 2L))))
  }

  test("vocab broadcasts; token classification stays scan-stage") {
    val docs = (0 until 100).map(i => ("s", s"w${i % 9} w${i % 7}")).toDF("source", "text")
    val plan = TextAnalysis.oovRate(docs, vocabSize = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
