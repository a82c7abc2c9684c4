package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the engine's late-row boundary for windowed aggregation: a row
  * whose window END equals the current watermark exactly. The
  * out-of-order replay oracle encodes this boundary in SQL, so it is a
  * TEST, not an assumption.
  */
class WatermarkBoundaryProbeSpec extends SparkSpec {
  import spark.implicits._

  private val min = 60L * 1000000L

  test("a row whose window end equals the watermark is dropped (end <= wm)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("event_type", "event_id", "t_us")
    val query = StreamingHeavyHitters.windowCounts(stream, windowMinutes = 10, delayMinutes = 5)
      .writeStream.format("memory").queryName("wm_probe").outputMode("append").start()

    input.addData(("a", 1L, 0L))            // window [0,10)
    query.processAllAvailable()
    input.addData(("a", 2L, 15 * min))      // watermark -> 15-5 = 10 min = window0 end
    query.processAllAvailable()
    input.addData(("a", 3L, 5 * min))       // window0 row, end == wm exactly
    query.processAllAvailable()
    input.addData(("z", 8L, 100 * min), ("z", 9L, 200 * min)) // flush
    query.processAllAvailable()
    query.stop()

    val w0 = spark.table("wm_probe").filter(col("window_start_us") === 0L)
      .select("n").as[Long].collect().toSeq
    // end <= wm drops the boundary row -> count 1; end < wm would keep it -> 2
    assert(w0 == Seq(1L), s"boundary semantics changed: window0 counts = $w0")
  }

  test("a row one microsecond inside the boundary is kept") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("event_type", "event_id", "t_us")
    val query = StreamingHeavyHitters.windowCounts(stream, windowMinutes = 10, delayMinutes = 5)
      .writeStream.format("memory").queryName("wm_probe2").outputMode("append").start()

    input.addData(("a", 1L, 0L))
    query.processAllAvailable()
    input.addData(("a", 2L, 15 * min - 1L)) // watermark -> one microsecond short of 10 min
    query.processAllAvailable()
    input.addData(("a", 3L, 5 * min))       // window0 end > wm: kept
    query.processAllAvailable()
    input.addData(("z", 8L, 100 * min), ("z", 9L, 200 * min))
    query.processAllAvailable()
    query.stop()

    val w0 = spark.table("wm_probe2").filter(col("window_start_us") === 0L)
      .select("n").as[Long].collect().toSeq
    assert(w0 == Seq(2L), s"boundary semantics changed: window0 counts = $w0")
  }
}
