package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingStaypointsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming detector matches batch semantics across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Double, Double)]

    val pfsStream = input.toDF().toDF("id", "user_id", "t", "lon", "lat")
      .select(col("id"), col("user_id"), to_timestamp(col("t")).as("tracked_at"), col("lon"), col("lat"))

    val detected = StreamingStaypoints.detect(pfsStream,
      StreamingStaypoints.Params(distThresholdMeters = 100, timeThresholdMinutes = 5, gapThresholdMinutes = 60))

    val query = detected.writeStream
      .format("memory").queryName("sp_out").outputMode("append").start()

    // micro-batch 1: dwell fixes
    input.addData(
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.30000),
      (1L, 1L, "2023-01-01 08:10:00", 8.5001, 47.30001))
    query.processAllAvailable()
    assert(spark.table("sp_out").count() == 0) // nothing closed yet

    // micro-batch 2: one more dwell fix then the breach
    input.addData(
      (2L, 1L, "2023-01-01 08:20:00", 8.5000, 47.30002),
      (3L, 1L, "2023-01-01 08:30:00", 8.5100, 47.31000))
    query.processAllAvailable()

    val rows = spark.table("sp_out").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("user_id") == 1L)
    assert(r.getAs[Long]("started_us") == 1672560000000000L) // 08:00 UTC
    assert(r.getAs[Long]("finished_us") == 1672561800000000L) // 08:30 (breach fix)
    assert(r.getAs[Int]("n_pfs") == 3)

    query.stop()
  }
}
