package graft.operators

import graft.SparkSpec

class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(tokensPerSource: Map[String, Int]) =
    tokensPerSource.toSeq.map { case (s, n) => (s, Seq.fill(n)("w").mkString(" ")) }
      .toDF("source", "text")

  test("budget below every cap splits uniformly with exact remainder distribution") {
    val docs = docsOf(Map("a" -> 100, "b" -> 100, "c" -> 100))
    val rows = CorpusOps.unimaxAllocation(docs, budget = 100L, epochCap = 1)
      .select("source", "allocated", "capped").as[(String, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.map(_._2).sum == 100L)
    assert(rows.forall(!_._3))
    // 100 div 3 = 33, remainder 1 goes to the first in (cap, source) order
    assert(rows.toSeq == Seq(("a", 34L, false), ("b", 33L, false), ("c", 33L, false)))
  }

  test("small sources cap at epochCap epochs; the rest waterfills") {
    // caps at 2 epochs: a=20, b=40, c=2000, d=2000; budget 1000
    val docs = docsOf(Map("a" -> 10, "b" -> 20, "c" -> 1000, "d" -> 1000))
    val rows = CorpusOps.unimaxAllocation(docs, budget = 1000L, epochCap = 2)
      .select("source", "allocated", "capped", "epochs")
      .as[(String, Long, Boolean, Double)].collect().sortBy(_._1).toSeq
    // a, b bind (20 + 40 = 60); c, d share 940 -> 470 each
    assert(rows.map(r => (r._1, r._2, r._3)) ==
      Seq(("a", 20L, true), ("b", 40L, true), ("c", 470L, false), ("d", 470L, false)))
    assert(rows.map(_._2).sum == 1000L)
    assert(math.abs(rows.head._4 - 2.0) < 1e-12) // capped source runs exactly epochCap epochs
  }

  test("budget above total capacity allocates every cap and stops (no oversampling)") {
    val docs = docsOf(Map("a" -> 10, "b" -> 20))
    val rows = CorpusOps.unimaxAllocation(docs, budget = 1000L, epochCap = 3)
      .select("source", "allocated", "capped").as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(("a", 30L, true), ("b", 60L, true)))
  }

  test("waterfilling invariants hold on a skewed mix") {
    val sizes = Map("s0" -> 7, "s1" -> 13, "s2" -> 61, "s3" -> 211, "s4" -> 499, "s5" -> 997)
    val budget = 1234L
    val rows = CorpusOps.unimaxAllocation(docsOf(sizes), budget, epochCap = 3)
      .select("source", "cap", "allocated", "capped")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    val (capped, uncapped) = rows.partition(_._4)
    assert(rows.map(_._3).sum == budget) // exact budget exhaustion (budget < total capacity)
    assert(capped.forall(r => r._3 == r._2)) // capped sources get exactly their cap
    assert(uncapped.forall(r => r._3 < r._2)) // uncapped stay under cap
    // uniform water level: uncapped allocations differ by at most 1
    assert(uncapped.map(_._3).max - uncapped.map(_._3).min <= 1)
    // every capped cap sits at or below the water level
    assert(capped.map(_._2).forall(_ <= uncapped.map(_._3).min))
  }
}
