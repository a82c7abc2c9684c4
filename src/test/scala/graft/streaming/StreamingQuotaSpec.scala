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

  test("out-of-order replay: state machine == closed-form effective-window contract") {
    // 40 rows, 2 groups; times are a mod-7 permutation so the residue
    // batches (id mod 4) are genuinely out of event-time order
    val chunks = 4
    val quotaN = 2L
    val windowUs = 10 * min
    val rows = (0L until 40L).map { i => (s"g${i % 2}", i, ((i * 7) % 40) * 3 * min) }

    val got = Replay.quotaOutOfOrder(rows.toDF("lang", "doc_id", "t_us"),
        quotaN = quotaN, windowMinutes = 10L, groupCol = "lang", chunks = chunks)
      .select("grp", "doc_id", "window_start_us", "seq_in_window")
      .as[(String, Long, Long, Long)].collect().toSet

    def ws(t: Long): Long = Math.floorDiv(t, windowUs) * windowUs

    // reference 1: direct simulation of the keyed state machine over the
    // residue-batch feed
    val expected = scala.collection.mutable.Set.empty[(String, Long, Long, Long)]
    val state = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for (p <- 0 until chunks) {
      val batch = rows.filter(r => r._2 % chunks == p)
      for ((grp, rs) <- batch.groupBy(_._1)) {
        var (w, c) = state.getOrElse(grp, (Long.MinValue, 0L))
        for ((_, id, t) <- rs.sortBy(r => (r._3, r._2))) {
          val s = ws(t)
          if (s > w) { w = s; c = 0L }
          if (c < quotaN) { c += 1; expected += ((grp, id, w, c)) }
        }
        state(grp) = (w, c)
      }
    }
    assert(got == expected.toSet, s"replay vs state machine:\n$got\nvs\n$expected")

    // reference 2: the ORACLE's closed form — effective window =
    // max(own window, max window of earlier batches), admission =
    // rank within (group, E) in (batch, t, id) arrival order
    val byBatch = rows.map { case (g, i, t) => (g, i, t, i % chunks) }
    val batchMax = byBatch.groupBy(r => (r._1, r._4))
      .view.mapValues(_.map(r => ws(r._3)).max).toMap
    def prevMax(g: String, b: Long): Long =
      (0L until b).flatMap(q => batchMax.get((g, q))).foldLeft(Long.MinValue)(math.max)
    val closed = byBatch
      .map { case (g, i, t, b) => (g, i, t, b, math.max(ws(t), prevMax(g, b))) }
      .groupBy(r => (r._1, r._5)).toSeq.flatMap { case ((g, e), rs) =>
        rs.sortBy(r => (r._4, r._3, r._2)).zipWithIndex
          .collect { case ((_, i, _, _, _), idx) if idx < quotaN => (g, i, e, idx + 1L) }
      }.toSet
    assert(got == closed, s"replay vs closed form:\n$got\nvs\n$closed")
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
