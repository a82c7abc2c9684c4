package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("events join the containing label intervals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val evIn = MemoryStream[(Long, Long, String)]
    val lbIn = MemoryStream[(Long, Long, String, String, String)]

    val events = evIn.toDF().toDF("event_id", "user_id", "t")
      .select(col("event_id"), col("user_id"), to_timestamp(col("t")).as("ts"))
    val labels = lbIn.toDF().toDF("label_id", "user_id", "label", "s", "f")
      .select(col("label_id"), col("user_id"), col("label"),
        to_timestamp(col("s")).as("started_at"), to_timestamp(col("f")).as("finished_at"))

    val query = StreamingIntervalJoin.enrich(events, labels,
        maxDurationMinutes = 120, watermarkMinutes = 60)
      .writeStream.format("memory").queryName("ivj_out").outputMode("append").start()

    // labels arrive first; the containing event arrives in a LATER batch
    lbIn.addData((10L, 1L, "walk", "2023-01-01 08:00:00", "2023-01-01 09:00:00"),
      (11L, 1L, "bike", "2023-01-01 09:00:00", "2023-01-01 10:00:00"),
      (12L, 2L, "car", "2023-01-01 08:00:00", "2023-01-01 09:00:00"))
    query.processAllAvailable()
    evIn.addData((0L, 1L, "2023-01-01 08:30:00"), // inside walk
      (1L, 1L, "2023-01-01 09:00:00"), // boundary: start of bike, not in walk (strict end)
      (2L, 2L, "2023-01-01 08:15:00"), // user 2 -> car
      (3L, 2L, "2023-01-01 11:00:00")) // after everything -> no match
    query.processAllAvailable()
    // an event whose label arrives AFTER it (still within watermark)
    evIn.addData((4L, 1L, "2023-01-01 09:30:00"))
    lbIn.addData((13L, 1L, "tram", "2023-01-01 09:20:00", "2023-01-01 09:40:00"))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("ivj_out")
      .select("event_id", "label_id").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 10L), (1L, 11L), (2L, 12L), (4L, 11L), (4L, 13L)))
  }

  test("left outer: unmatched events null-extend exactly once, on watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val evIn = MemoryStream[(Long, Long, String)]
    val lbIn = MemoryStream[(Long, Long, String, String, String)]

    val events = evIn.toDF().toDF("event_id", "user_id", "t")
      .select(col("event_id"), col("user_id"), to_timestamp(col("t")).as("ts"))
    val labels = lbIn.toDF().toDF("label_id", "user_id", "label", "s", "f")
      .select(col("label_id"), col("user_id"), col("label"),
        to_timestamp(col("s")).as("started_at"), to_timestamp(col("f")).as("finished_at"))

    val query = StreamingIntervalJoin.enrichLeftOuter(events, labels,
        maxDurationMinutes = 120, watermarkMinutes = 60)
      .writeStream.format("memory").queryName("ivj_outer_out").outputMode("append").start()

    lbIn.addData((10L, 1L, "walk", "2023-01-01 08:00:00", "2023-01-01 09:00:00"))
    query.processAllAvailable()
    evIn.addData((0L, 1L, "2023-01-01 08:30:00"), // inside walk -> matched
      (1L, 1L, "2023-01-01 09:00:00"),            // strict end -> unmatched
      (2L, 2L, "2023-01-01 08:15:00"))            // no labels for user 2 -> unmatched
    query.processAllAvailable()
    // matched rows emit immediately; null rows must NOT exist yet (the
    // watermark has not proven no future label can match)
    val early = spark.table("ivj_outer_out")
      .select("event_id", "label_id").collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(early == Set((0L, 10L)), early)

    // sentinel batch on BOTH feeds advances the global watermark past
    // every event's eviction point (ts + maxDuration + delay), then one
    // more batch runs the eviction that emits the trailing null rows
    evIn.addData((90L, 99L, "2023-01-01 13:00:00"))
    lbIn.addData((91L, 99L, "x", "2023-01-01 13:00:00", "2023-01-01 13:00:01"))
    query.processAllAvailable()
    evIn.addData((92L, 99L, "2023-01-01 13:01:00"))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("ivj_outer_out")
      .filter(col("user_id") < 90)
      .select("event_id", "label_id").collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(out == Set((0L, 10L), (1L, null), (2L, null)), out)
  }

  test("replay left outer matches the batch outer containment join") {
    import graft.streaming.Replay
    val ev = Seq((1L, 1L, 1000000000L), (2L, 1L, 5000000000000L), (3L, 2L, 1000000000L))
      .toDF("event_id", "user_id", "t_us")
    val lab = Seq((10L, 1L, 0L, 2000000000L, 7L)) // contains event 1 only
      .toDF("label_id", "user_id", "s_us", "f_us", "label")
    for (chunks <- Seq(1, 2, 3)) {
      val got = Replay.intervalJoin(ev, lab, maxDurationMinutes = 600, chunks = chunks,
          leftOuter = true)
        .select("event_id", "label_id")
        .collect().map(r => (r.getLong(0), r.get(1))).toSet
      assert(got == Set((1L, 10L), (2L, null), (3L, null)), s"chunks=$chunks: $got")
    }
  }

  test("replay left outer tolerates empty feeds") {
    import graft.streaming.Replay
    val ev = spark.emptyDataset[(Long, Long, Long)].toDF("event_id", "user_id", "t_us")
    val lab = spark.emptyDataset[(Long, Long, Long, Long, Long)]
      .toDF("label_id", "user_id", "s_us", "f_us", "label")
    assert(Replay.intervalJoin(ev, lab, maxDurationMinutes = 600, chunks = 2,
      leftOuter = true).count() == 0L)
  }
}
