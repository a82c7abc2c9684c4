package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventRateSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in micros

  test("rate anomalies: burst bucket flagged, quiet buckets and steady user clean") {
    // user 1: one event in each of hours 0..9, 30 events in hour 10
    val quiet = (0 until 10).map(h => (h.toLong, h * H + 5L, 1L))
    val burst = (0 until 30).map(i => (100L + i, 10 * H + i.toLong, 1L))
    // user 2: perfectly steady — never flagged
    val steady = (0 until 12).map(h => (200L + h, h * H + 7L, 2L))
    val events = (quiet ++ burst ++ steady).toDF("event_id", "t_us", "user_id")
    val got = EventOps.rateAnomalies(events, zThreshold = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (user, bucket, c, n, sc, sc2) = got.head
    assert((user, bucket, c) == ((1L, 10 * H, 30L)))
    assert((n, sc, sc2) == ((11L, 40L, 910L)))
    // the cross-multiplied decision the operator made, replayed exactly
    val dev = c * n - sc
    assert(dev > 0 && dev * dev > 9L * (n * sc2 - sc * sc))
  }

  test("rate anomalies: single-bucket user can never self-flag") {
    val events = (0 until 50).map(i => (i.toLong, i.toLong, 7L))
      .toDF("event_id", "t_us", "user_id")
    assert(EventOps.rateAnomalies(events).count() == 0L)
  }

  test("decayed counts: exact power-of-two weights with the documented 40-half-life floor") {
    val day = 24L * H
    val ref = 100L * day
    val events = Seq(
      (0L, ref, "a"),           // age 0      → 2^40
      (1L, ref - day, "a"),     // age 1 hl   → 2^39
      (2L, ref - 2 * day, "b"), // age 2 hl   → 2^38
      (3L, ref - 41 * day, "b") // past floor → 0
    ).toDF("event_id", "t_us", "event_type")
    val got = EventOps.decayedCounts(events, halfLifeHours = 24L)
      .as[(String, Long, BigDecimal)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((2L, BigDecimal((1L << 40) + (1L << 39)))))
    assert(got("b") == ((2L, BigDecimal(1L << 38))))
  }
}
