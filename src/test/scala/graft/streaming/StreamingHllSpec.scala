package graft.streaming

import graft.SparkSpec
import graft.operators.Hll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** HLL as a *streaming* aggregation: the register table is a plain
  * `groupBy(group, register).max(rank)`, so Structured Streaming keeps
  * exactly m=256 rows of state per group — a distinct-count over an
  * unbounded stream with constant memory, and bit-identical to the
  * batch sketch at every micro-batch boundary.
  */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0 until 300).map(i => ("s" + (i % 2), s"tok${i % 90} tok${(i * 13) % 90}"))

  test("streaming register table equals the batch sketch after both micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val tokens = input.toDF().toDF("source", "text")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))

    val query = Hll.registerTable(tokens, "source", "tok")
      .writeStream.format("memory").queryName("hll_out").outputMode("complete").start()
    input.addData(docs.take(120))
    query.processAllAvailable()
    input.addData(docs.drop(120))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("hll_out")
      .as[(String, Long, Int)].collect().toSet
    val batch = Hll.registerTable(
      docs.toDF("source", "text")
        .select(col("source"), explode(split(col("text"), " ")).as("tok")),
      "source", "tok").as[(String, Long, Int)].collect().toSet
    assert(streamed == batch)
    assert(batch.groupBy(_._1).forall(_._2.size <= Hll.M)) // bounded state per group
  }

  test("merge of partial sketches equals the sketch of the union (incremental ingest)") {
    val (day1, day2) = docs.splitAt(137)
    def regs(part: Seq[(String, String)]) = Hll.registerTable(
      part.toDF("source", "text")
        .select(col("source"), explode(split(col("text"), " ")).as("tok")),
      "source", "tok")
    val merged = Hll.summarize(Hll.merge(Seq(regs(day1), regs(day2)), "source"), "source")
      .as[(String, Long, Long, Long)].collect().toSet
    val direct = Hll.distinctTokens(docs.toDF("source", "text"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(merged == direct)
  }
}
