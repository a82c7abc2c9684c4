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

  test("late rows: streaming charges the current window (documented divergence from batch)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("lang", "doc_id", "t_us")
    val query = StreamingQuota.quota(stream, quota = 2, windowMinutes = 10,
        idleHorizonMinutes = 0)
      .writeStream.format("memory").queryName("qt_late").outputMode("append").start()
    // batch 1 advances en to window [10min, 20min)
    input.addData(("en", 0L, 11 * min))
    query.processAllAvailable()
    // batch 2 delivers a LATE row of window [0, 10min)
    input.addData(("en", 1L, 1 * min))
    query.processAllAvailable()
    query.stop()

    val streaming = spark.table("qt_late")
      .select("doc_id", "window_start_us", "seq_in_window").as[(Long, Long, Long)].collect().toSet
    // the late row is stamped with (and charged against) the CURRENT window
    assert(streaming == Set((0L, 10 * min, 1L), (1L, 10 * min, 2L)))
    // the batch twin assigns the row to its TRUE window — divergence by design
    val batch = StreamingQuota.quotaBatch(
        Seq(("en", 0L, 11 * min), ("en", 1L, 1 * min)).toDF("lang", "doc_id", "t_us"),
        quotaN = 2, windowMinutes = 10)
      .select("doc_id", "window_start_us", "seq_in_window").as[(Long, Long, Long)].collect().toSet
    assert(batch == Set((0L, 10 * min, 1L), (1L, 0L, 1L)))
  }

  test("batch window starts use integer arithmetic: exact for negative and > 2^53 timestamps") {
    val windowUs = 10 * min
    // pre-epoch rows and rows beyond double's exact-integer range
    val big = (1L << 53) + 3L * min
    val df = Seq(("en", 0L, -1L), ("en", 1L, -windowUs - 1L), ("en", 2L, big))
      .toDF("lang", "doc_id", "t_us")
    val got = StreamingQuota.quotaBatch(df, quotaN = 10, windowMinutes = 10)
      .select("doc_id", "window_start_us").as[(Long, Long)].collect().toMap
    assert(got(0L) == Math.floorDiv(-1L, windowUs) * windowUs)         // -windowUs
    assert(got(1L) == Math.floorDiv(-windowUs - 1L, windowUs) * windowUs) // -2*windowUs
    assert(got(2L) == Math.floorDiv(big, windowUs) * windowUs)         // exact beyond 2^53
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
