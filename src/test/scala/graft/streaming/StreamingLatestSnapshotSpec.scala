package graft.streaming

import graft.SparkSpec
import graft.operators.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming parity of [[EventOps.latestSnapshot]]: the struct-max
  * aggregate is an ordinary streaming aggregation (commutative +
  * associative — no sort window, no custom state), so the same code
  * maintains the "current row per key" view continuously in update/
  * complete mode. This is the property that makes the CDC-compaction
  * primitive deployable as a live materialized view, not just a batch
  * job; the spec pins streamed state == the batch result over the same
  * rows, including a cross-batch overwrite and a timestamp tie.
  */
class StreamingLatestSnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("latestSnapshot streams as a plain stateful aggregate and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq((10L, 100L, 1L, "view"), (12L, 200L, 2L, "view"))
    val batch2 = Seq(
      (11L, 300L, 1L, "view"), // overwrites user 1's earlier row across batches
      (13L, 200L, 2L, "view"), // ts tie with event 12 — larger id wins
      (14L, 50L, 1L, "buy"))
    val input = MemoryStream[(Long, Long, Long, String)]
    val query = EventOps.latestSnapshot(
        input.toDF().toDF("event_id", "t_us", "user_id", "event_type"),
        Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("latest_out")
      .outputMode("complete").start()
    input.addData(batch1: _*); query.processAllAvailable()
    input.addData(batch2: _*); query.processAllAvailable()
    query.stop()
    val streamed = spark.table("latest_out").collect().map(_.mkString("|")).toSet
    val batch = EventOps.latestSnapshot(
        (batch1 ++ batch2).toDF("event_id", "t_us", "user_id", "event_type"),
        Seq("user_id", "event_type"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
    assert(streamed.contains("1|view|300|11|2"))
    assert(streamed.contains("2|view|200|13|2"))
  }
}
