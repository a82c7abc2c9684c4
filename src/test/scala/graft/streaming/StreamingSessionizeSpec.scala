package graft.streaming

import graft.SparkSpec
import graft.operators.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    // user 1: two sessions split by a 45-minute gap
    (0L, 1L, "2023-01-01 08:00:00"),
    (1L, 1L, "2023-01-01 08:10:00"),
    (2L, 1L, "2023-01-01 08:55:00"),
    (3L, 1L, "2023-01-01 09:05:00"),
    // user 2: one session
    (4L, 2L, "2023-01-01 10:00:00"))

  test("streaming session ids match the batch operator across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val stream = input.toDF().toDF("event_id", "user_id", "t")
      .select(col("event_id"), col("user_id"), to_timestamp(col("t")).as("ts"))

    val query = StreamingSessionize.assign(stream, gapMinutes = 30.0)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()

    // split the same events over two micro-batches mid-session
    input.addData(events.take(2))
    query.processAllAvailable()
    input.addData(events.drop(2))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("sess_out")
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap

    val batch = EventOps.sessionize(
      events.toDF("event_id", "user_id", "t")
        .select(col("event_id"), col("user_id"),
          unix_micros(to_timestamp(col("t"))).as("t_us")),
      gapMinutes = 30.0, tsCol = "t_us")
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap

    assert(streamed == batch)
    assert(streamed(0L) == 0L && streamed(2L) == 1L) // gap splits user 1
    assert(streamed(4L) == 0L)
  }

  test("watermarked windowed counts finalize as the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, String)]
    val stream = input.toDF().toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"), to_timestamp(col("t")).as("ts"), col("event_type"))

    val query = StreamingSessionize.windowedCounts(stream, windowMinutes = 60, watermarkMinutes = 10)
      .writeStream.format("memory").queryName("wc_out").outputMode("append").start()

    input.addData((0L, 1L, "2023-01-01 08:05:00", "click"), (1L, 1L, "2023-01-01 08:20:00", "click"))
    query.processAllAvailable()
    // nothing finalized while the watermark is inside the window
    assert(spark.table("wc_out").count() == 0)

    // an event far past the window pushes the watermark beyond 09:00
    input.addData((2L, 1L, "2023-01-01 10:00:00", "view"))
    query.processAllAvailable()
    input.addData((3L, 1L, "2023-01-01 12:00:00", "view"))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("wc_out").collect()
    val c = rows.find(r => r.getAs[String]("event_type") == "click").get
    assert(c.getAs[Long]("n_events") == 2L)
    assert(c.getAs[java.sql.Timestamp]("window_start").toInstant.toString == "2023-01-01T08:00:00Z")
  }
}
