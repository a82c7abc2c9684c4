package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String, batches: Seq[Seq[(Long, String)]],
                  maxBucketSize: Int = 64): Seq[(Long, Long, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val query = StreamingNearDup.candidates(stream, numHashes = 16, bands = 4,
        idleHorizonMinutes = 0, maxBucketSize = maxBucketSize)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    spark.table(name).as[StreamingNearDup.Candidate].collect().toSeq
      .map(c => (c.id_a, c.id_b, c.band))
  }

  test("near-identical documents across micro-batches emit a candidate pair") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "completely unrelated content about spark physical planning"
    val out = run("nd1", Seq(Seq(1L -> a, 3L -> other), Seq(2L -> b)))
    val pairs = out.map(t => (t._1, t._2)).distinct
    assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("identical documents collide in every band; consumers dedup on (id_a, id_b)") {
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val out = run("nd2", Seq(Seq(1L -> t), Seq(2L -> t)))
    assert(out.map(x => (x._1, x._2)).distinct === Seq((1L, 2L)))
    assert(out.size === 4, "identical docs collide in all 4 bands")
  }

  test("hot-bucket cap bounds residents: later arrivals pair against the capped set only") {
    val t = "one two three four five six seven eight nine ten"
    val out = run("nd3", Seq(Seq(1L -> t), Seq(2L -> t), Seq(3L -> t), Seq(4L -> t)),
      maxBucketSize = 2)
    val pairs = out.map(x => (x._1, x._2)).distinct.sorted
    // residents cap at {1, 2}; 3 and 4 pair against them but are not
    // stored, so (3, 4) is never emitted — bounded output, degraded recall
    assert(pairs === Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
  }

  test("streaming candidate set equals the batch banding candidate set") {
    val docs = Seq(
      1L -> "spark shuffles partition data across the cluster by key",
      2L -> "spark shuffles partition data across the cluster by key always",
      3L -> "ducks swim in the pond near the old mill every morning",
      4L -> "ducks swim in the pond near the old mill every single morning",
      5L -> "totally different text with no overlap whatsoever here now")
    val streamPairs = run("nd4", Seq(docs.take(2), docs.drop(2)))
      .map(x => (x._1, x._2)).distinct.toSet
    val batchPairs = Dedup.minHashLsh(docs.toDF("doc_id", "text"),
        numHashes = 16, bands = 4, verifyThreshold = 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(streamPairs === batchPairs)
  }
}
