package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[StreamingHeavyHitters]]: the engine-managed watermark + windowed
  * aggregation path. Pins the two sides of the append-mode contract —
  * a window's counts are emitted exactly once, as finals, when the
  * watermark passes; and rows later than the delay are DROPPED (state
  * stays bounded), the documented divergence from a batch groupBy.
  */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val min = 60L * 1000000L

  test("windows finalize exactly once when the watermark passes their end") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("event_type", "event_id", "t_us")
    val query = StreamingHeavyHitters.windowCounts(stream, windowMinutes = 10, delayMinutes = 5)
      .writeStream.format("memory").queryName("hh_out").outputMode("append").start()

    // window [0,10): a×2, b×1 — nothing can emit until the watermark moves
    input.addData(("a", 1L, 1 * min), ("a", 2L, 2 * min), ("b", 3L, 3 * min))
    query.processAllAvailable()
    assert(spark.table("hh_out").count() == 0, "no final before the watermark")

    // t=30min advances the watermark to 25min > 10min: window 0 finalizes
    input.addData(("a", 4L, 30 * min))
    query.processAllAvailable()
    input.addData(("c", 5L, 60 * min)) // extra cycle + close window [30,40)
    query.processAllAvailable()
    query.stop()

    val out = spark.table("hh_out")
      .select("window_start_us", "key", "n").as[(Long, String, Long)].collect().toSet
    assert(out == Set((0L, "a", 2L), (0L, "b", 1L), (30 * min, "a", 1L)))
  }

  test("rows later than the delay are dropped — bounded state, documented loss") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("event_type", "event_id", "t_us")
    val query = StreamingHeavyHitters.windowCounts(stream, windowMinutes = 10, delayMinutes = 5)
      .writeStream.format("memory").queryName("hh_late").outputMode("append").start()

    input.addData(("a", 1L, 1 * min), ("a", 2L, 100 * min)) // watermark -> 95min
    query.processAllAvailable()
    input.addData(("a", 3L, 2 * min)) // 93 minutes late: dropped
    query.processAllAvailable()
    input.addData(("z", 9L, 200 * min), ("z", 10L, 300 * min)) // flush
    query.processAllAvailable()
    query.stop()

    val w0 = spark.table("hh_late").filter(col("window_start_us") === 0L)
      .select("key", "n").as[(String, Long)].collect().toSet
    assert(w0 == Set(("a", 1L)), "the late row must not resurrect the closed window")
  }

  test("topK ranks by (count desc, key asc) within each window") {
    val counts = Seq((0L, "b", 5L), (0L, "a", 5L), (0L, "c", 9L), (0L, "d", 1L),
      (600L, "x", 2L)).toDF("window_start_us", "key", "n")
    val got = StreamingHeavyHitters.topK(counts, k = 2)
      .select("window_start_us", "key", "rank").as[(Long, String, Long)].collect().toSet
    assert(got == Set((0L, "c", 1L), (0L, "a", 2L), (600L, "x", 1L)))
  }

  test("replay equals the batch groupBy + rank on an in-order table") {
    val events = Seq(
      ("a", 1L, 1 * min), ("a", 2L, 2 * min), ("b", 3L, 3 * min),
      ("b", 4L, 61 * min), ("c", 5L, 62 * min), ("c", 6L, 63 * min), ("c", 7L, 64 * min))
      .toDF("event_type", "event_id", "t_us")
    val got = Replay.heavyHitters(events, k = 2, windowMinutes = 60, delayMinutes = 30,
        chunks = 2)
      .select("window_start_us", "key", "n", "rank")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, "a", 2L, 1L), (0L, "b", 1L, 2L),
      (60 * min, "c", 3L, 1L), (60 * min, "b", 1L, 2L)))
  }
}
