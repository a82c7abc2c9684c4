package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("events pick up the latest at-or-before label across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Boolean, Long, Long)]
    val stream = in.toDF().toDF("user_id", "is_label", "id", "t_us")
    val query = StreamingAsOf.enrich(stream)
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()

    // batch 1: a label at t=10, an event before it and one at it
    in.addData((1L, false, 100L, 5L),   // before any label -> nulls
      (1L, true, 7L, 10L),
      (1L, false, 101L, 10L))           // at-label-time: <= counts
    query.processAllAvailable()
    // batch 2: state carries the label; a newer label replaces it; ties
    // at one (user, t) resolve to the max label id
    in.addData((1L, false, 102L, 15L),  // still label 7
      (1L, true, 8L, 20L), (1L, true, 9L, 20L),
      (1L, false, 103L, 25L),           // max-id label 9 wins the tie
      (2L, false, 200L, 99L))           // other user: no labels -> nulls
    query.processAllAvailable()
    query.stop()

    val out = spark.table("asof_out")
      .select("event_id", "label_id", "label_t_us")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
    assert(out == Set(
      (100L, null, null),
      (101L, 7L, 10L),
      (102L, 7L, 10L),
      (103L, 9L, 20L),
      (200L, null, null)), out)
  }

  test("a late event never enriches with a future label (leakage guard)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Boolean, Long, Long)]
    val stream = in.toDF().toDF("user_id", "is_label", "id", "t_us")
    val query = StreamingAsOf.enrich(stream)
      .writeStream.format("memory").queryName("asof_late_out").outputMode("append").start()

    in.addData((1L, true, 7L, 100L))   // label timeline advances to t=100
    query.processAllAvailable()
    in.addData((1L, false, 50L, 40L))  // late event at t=40: the state's
    query.processAllAvailable()        // label is from its future
    query.stop()

    val out = spark.table("asof_late_out")
      .select("event_id", "label_id").collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(out == Set((50L, null)), out)
  }

  test("replay matches the batch as-of join at every chunking") {
    val ev = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 15L), (200L, 2L, 9L))
      .toDF("event_id", "user_id", "t_us")
    val lab = Seq((7L, 1L, 10L), (8L, 1L, 12L)).toDF("label_id", "user_id", "t_us")
    val expect = Set(
      (100L, null, null),
      (101L, 7L.asInstanceOf[AnyRef], 10L.asInstanceOf[AnyRef]),
      (102L, 8L.asInstanceOf[AnyRef], 12L.asInstanceOf[AnyRef]),
      (200L, null, null))
    for (chunks <- Seq(1, 2, 5)) {
      val got = Replay.asOf(ev, lab, chunks = chunks)
        .select("event_id", "label_id", "label_t_us")
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSet
      assert(got == expect, s"chunks=$chunks: $got")
    }
  }

  test("replay tolerates empty feeds") {
    val ev = spark.emptyDataset[(Long, Long, Long)].toDF("event_id", "user_id", "t_us")
    val lab = spark.emptyDataset[(Long, Long, Long)].toDF("label_id", "user_id", "t_us")
    assert(Replay.asOf(ev, lab).count() == 0L)
  }
}
