package graft.streaming

import graft.SparkSpec
import graft.operators.SpatialOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch parity for co-location meeting detection, plus the
  * state-boundedness contract (the join condition must give the planner
  * watermark-eviction bounds on BOTH inputs — an unbounded stream-stream
  * join would be refused or grow without limit).
  */
class StreamingColocationSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60000000L // one minute in micros
  // realistic era base: Catalyst's derived state watermarks go negative
  // (and evict everything) when event times sit within the watermark
  // horizon of epoch 0 — a degenerate region no real stream occupies
  private val T0 = 1700000000000000L

  // (user_id, s_us, f_us, lon, lat): users 1/2 overlap in the same cell,
  // user 3 overlaps in time but in a far cell, user 4 shares the cell
  // but not the time
  private val rows = Seq(
    (1L, T0, T0 + 30L * M, -122.4, 47.6),
    (2L, T0 + 10L * M, T0 + 40L * M, -122.3999, 47.6001), // same cell (floor on negative lon)
    (3L, T0 + 5L * M, T0 + 35L * M, -100.0, 40.0),
    (4L, T0 + 120L * M, T0 + 150L * M, -122.4, 47.6),
    (2L, T0 + 200L * M, T0 + 230L * M, -122.4, 47.6), // second visit, meets nobody
    (1L, T0 + 205L * M, T0 + 226L * M, -122.4, 47.6)  // ...except user 1 again
  )

  test("streaming meetings match the batch operator row for row") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double, Double)]
    val stream = input.toDF().toDF("user_id", "s_us", "f_us", "lon", "lat")
      .withColumn("started_at", timestamp_micros(col("s_us")))
      .withColumn("finished_at", timestamp_micros(col("f_us")))
    val q = StreamingColocation.meetings(stream, cellMicroDeg = 10000L,
        maxDurationMinutes = 60, watermarkMinutes = 10)
      .writeStream.format("memory").queryName("colo_out").outputMode("append").start()
    input.addData(rows.take(3): _*); q.processAllAvailable()
    input.addData(rows.drop(3): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("colo_out")
      .select(col("user_a"), col("user_b"),
        unix_micros(col("m_started_at")).as("ms"), unix_micros(col("m_finished_at")).as("mf"))
      .as[(Long, Long, Long, Long)].collect().toSet

    val batch = SpatialOps.colocationMeetings(
        rows.toDF("user_id", "s_us", "f_us", "lon", "lat"), cellMicroDeg = 10000L)
      .select(col("user_a"), col("user_b"), col("m_s_us"), col("m_f_us"))
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(streamed.contains((1L, 2L, T0 + 10L * M, T0 + 30L * M)), "the overlapping pair is found")
    assert(streamed.exists(m => m._1 == 1L && m._2 == 2L && m._3 == T0 + 205L * M),
      "the second encounter is a separate meeting")
    assert(!streamed.exists(m => m._1 == 3L || m._2 == 3L), "far cell never pairs")
    assert(!streamed.exists(m => m._1 == 4L || m._2 == 4L), "disjoint time never pairs")
  }

  test("join state EVICTS as the watermark advances — bounded on both sides") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double, Double)]
    val stream = input.toDF().toDF("user_id", "s_us", "f_us", "lon", "lat")
      .withColumn("started_at", timestamp_micros(col("s_us")))
      .withColumn("finished_at", timestamp_micros(col("f_us")))
    val q = StreamingColocation.meetings(stream, maxDurationMinutes = 60,
        watermarkMinutes = 10)
      .writeStream.format("memory").queryName("colo_bounds").outputMode("append").start()
    try {
      input.addData(rows.take(4): _*); q.processAllAvailable()
      // jump event time three orders of magnitude ahead: the watermark
      // sails past every first-batch interval, which must leave state
      input.addData((9L, T0 + 100000L * M, T0 + 100030L * M, -122.4, 47.6)); q.processAllAvailable()
      input.addData((8L, T0 + 100100L * M, T0 + 100130L * M, -122.4, 47.6)); q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty, "a stream-stream join must report a state operator")
      val total = st.map(_.numRowsTotal).sum
      // 6 interval rows entered (x2 join sides); with unbounded state all
      // would remain — eviction must have dropped the first batch
      assert(total <= 4, s"old intervals must leave the join state, still holds $total rows")
      assert(q.exception.isEmpty)
    } finally q.stop()
  }
}
