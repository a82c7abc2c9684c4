package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence passes, later copies drop — across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    val query = StreamingDedup.dedup(stream, idleHorizonMinutes = 0)
      .writeStream.format("memory").queryName("dd_out").outputMode("append").start()

    input.addData((0L, "alpha beta"), (1L, "gamma delta"), (2L, "alpha beta"))
    query.processAllAvailable()
    // same content arriving in a LATER micro-batch must also drop
    input.addData((3L, "alpha beta"), (4L, "epsilon zeta"))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("dd_out").select("doc_id").as[Long].collect().toSet
    assert(out == Set(0L, 1L, 4L), s"got $out")
  }

  test("duplicate audit mode flags copies and points at the keeper") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    val query = StreamingDedup.dedup(stream, idleHorizonMinutes = 0, emitDuplicates = true)
      .writeStream.format("memory").queryName("dd_audit").outputMode("append").start()

    input.addData((10L, "one two"), (11L, "one two"), (12L, "three four"))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("dd_audit")
      .select("doc_id", "is_first", "first_doc_id")
      .as[(Long, Boolean, Long)].collect().toSet
    assert(rows == Set((10L, true, 10L), (11L, false, 10L), (12L, true, 12L)))
  }

  test("within one micro-batch the smallest doc id is the keeper, matching batch dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    val query = StreamingDedup.dedup(stream, idleHorizonMinutes = 0)
      .writeStream.format("memory").queryName("dd_keep").outputMode("append").start()

    // arrival order deliberately reversed
    input.addData((7L, "same text"), (5L, "same text"), (6L, "same text"))
    query.processAllAvailable()
    query.stop()

    val kept = spark.table("dd_keep").select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(5L), s"got $kept")

    val batchKeeper = graft.operators.Dedup.exact(
      Seq((7L, "same text"), (5L, "same text"), (6L, "same text")).toDF("doc_id", "text"))
      .select("keep_id").as[Long].collect().toSeq
    assert(batchKeeper == Seq(5L))
  }

  test("out-of-order replay: keeper is min by (batch, id), not global min id") {
    // hash groups: docs 0..7 share text "dup"; batch p = ids mod 4, so
    // batch 0 = {0, 4}, and the keeper must be 0 anyway; docs {5, 2}
    // share "two" -> batches 1 and 2: keeper is 5 (earlier BATCH), not
    // the globally smaller 2 - the documented divergence from batch
    val docs = Seq(
      (0L, "dup"), (4L, "dup"),
      (5L, "two"), (2L, "two"),
      (7L, "solo")
    ).toDF("doc_id", "text")
    val got = Replay.dedupOutOfOrder(docs, chunks = 4)
      .select("doc_id", "is_first", "first_doc_id")
      .as[(Long, Boolean, Long)].collect().toSet
    assert(got == Set(
      (0L, true, 0L), (4L, false, 0L),
      (5L, true, 5L), (2L, false, 5L),
      (7L, true, 7L)), got)
  }
}
