package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingQuotaSpec extends SparkSpec {
  import spark.implicits._

  private val min = 60L * 1000000L // one minute in micros

  test("per-group quota admits first k per window, resets on the next window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("lang", "doc_id", "t_us")

    val query = StreamingQuota.quota(stream, quota = 2, windowMinutes = 10,
        idleHorizonMinutes = 0)
      .writeStream.format("memory").queryName("qt_out").outputMode("append").start()

    // window [0, 10min): en sends 3 (one over quota), de sends 1
    input.addData(("en", 0L, 1 * min), ("en", 1L, 2 * min), ("en", 2L, 3 * min),
      ("de", 10L, 2 * min))
    query.processAllAvailable()
    // next window [10, 20min): en's budget resets
    input.addData(("en", 3L, 11 * min), ("en", 4L, 12 * min), ("en", 5L, 13 * min))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("qt_out")
      .select("group", "doc_id", "seq_in_window").as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("en", 0L, 1L), ("en", 1L, 2L),             // doc 2 over quota, dropped
      ("de", 10L, 1L),
      ("en", 3L, 1L), ("en", 4L, 2L)))            // doc 5 over quota in window 2
  }

  test("audit mode flags overflow instead of dropping") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("lang", "doc_id", "t_us")

    val query = StreamingQuota.quota(stream, quota = 1, windowMinutes = 10,
        emitRejected = true, idleHorizonMinutes = 0)
      .writeStream.format("memory").queryName("qt_audit").outputMode("append").start()

    input.addData(("en", 0L, 1 * min), ("en", 1L, 2 * min))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("qt_audit")
      .select("doc_id", "admitted").as[(Long, Boolean)].collect().toSet
    assert(rows == Set((0L, true), (1L, false)))
  }

  test("streaming admission == batch twin on in-order input") {
    implicit val sqlCtx = spark.sqlContext
    // 30 docs, 3 groups, 2 windows, deliberately quota-exceeding traffic
    val data = (0L until 30L).map { i =>
      (s"g${i % 3}", i, (i / 3) * 2 * min) // event times climb within groups
    }
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("lang", "doc_id", "t_us")
    val query = StreamingQuota.quota(stream, quota = 3, windowMinutes = 10,
        idleHorizonMinutes = 0)
      .writeStream.format("memory").queryName("qt_parity").outputMode("append").start()
    input.addData(data: _*)
    query.processAllAvailable()
    query.stop()

    val streaming = spark.table("qt_parity")
      .select("group", "doc_id", "window_start_us", "seq_in_window")
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = StreamingQuota.quotaBatch(data.toDF("lang", "doc_id", "t_us"),
        quotaN = 3, windowMinutes = 10)
      .select("group", "doc_id", "window_start_us", "seq_in_window")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streaming == batch, s"streaming $streaming\nvs batch $batch")
    assert(streaming.nonEmpty && streaming.size < 30, "quota must actually reject some")
  }
}
