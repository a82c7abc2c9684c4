package graft.streaming

import graft.SparkSpec
import graft.operators.{CorpusOps, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming safety of the round-8 scan-stage operators: URL
  * canonicalization, language-id, CDC chunking (its only window is
  * per-document — complete rows arrive together in an append stream,
  * so... it is NOT stateless; kept batch) — this spec pins which of the
  * new ops run unchanged on a stream and that their output matches the
  * batch application row for row.
  */
class StreamingScanOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the a of and to the", "HTTPS://User@Sub1.Example.COM:443/a//b/?utm_source=x&b=2#f"),
    (2L, "der die das und nicht", "http://h.example.com:80/p?fbclid=z"),
    (3L, "el la de y que", "https://k.example.com:8080/deep//x?a=1"))

  private def runStream(f: DataFrame => DataFrame, name: String): Set[String] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val query = f(input.toDF().toDF("doc_id", "text", "url"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    input.addData(docs.take(1): _*); query.processAllAvailable()
    input.addData(docs.drop(1): _*); query.processAllAvailable()
    query.stop()
    spark.table(name).collect().map(_.mkString("|")).toSet
  }

  test("url canonicalization and language id stream unchanged and match batch") {
    val stage: DataFrame => DataFrame = in =>
      TextAnalysis.urlCanonicalize(TextAnalysis.languageId(in))
        .select(col("doc_id"), col("predicted_lang"), col("canon_url"))
    val streamed = runStream(stage, "scanops_out")
    val batch = stage(docs.toDF("doc_id", "text", "url"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
    assert(batch.exists(_.contains("https://sub1.example.com/a/b?b=2")))
  }

  test("negative sampling's candidate generation is scan-stage after the broadcast bound") {
    // not a streaming op (needs the corpus id set), but its per-row draw
    // side must stay shuffle-free: assert the only exchanges are the
    // 1-row bound broadcast and the existence join
    val df = (0L until 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val plan = CorpusOps.negativeSamples(df, k = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 4, s"expected a bounded exchange count, got $exchanges:\n$plan")
  }
}
