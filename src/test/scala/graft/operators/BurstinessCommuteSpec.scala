package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BurstinessCommuteSpec extends SparkSpec {
  import spark.implicits._

  test("burstiness: clockwork -1, extremes positive, exact integer moments") {
    val M = 60000000L
    val clockwork = (0 until 20).map(i => (1L, i.toLong * M, i.toLong))
    // bursty: 10 events in quick succession then a huge silence, repeated
    val bursty = (0 until 20).map { i =>
      val t = (i / 10).toLong * 10000L * M + (i % 10).toLong * M
      (2L, t, 100L + i)
    }
    val df = (clockwork ++ bursty).toDF("user_id", "t_us", "event_id")
    val got = EventOps.burstiness(df)
      .select("user_id", "n_gaps", "sum_gap_s", "burstiness")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 19L && got(1L)._3 == 19L * 60L)
    assert(math.abs(got(1L)._4 - (-1.0)) < 1e-12) // sigma = 0 -> B = -1
    assert(got(2L)._4 > 0.5, s"bursty user B = ${got(2L)._4}")
  }

  test("commute distance: top-1 and top-2 dwell locations, haversine between integer centroids") {
    def mkSp(u: Long, loc: Long, id: Long, durMin: Long, lon: Double, lat: Double) =
      (id, u, loc, ts("2023-01-01 08:00:00"),
        new java.sql.Timestamp(ts("2023-01-01 08:00:00").getTime + durMin * 60000L), lon, lat)
    val sp = Seq(
      mkSp(1L, 0L, 0L, 600L, -122.40, 47.60), // home: most dwell
      mkSp(1L, 0L, 1L, 600L, -122.40, 47.60),
      mkSp(1L, 1L, 2L, 400L, -122.30, 47.60), // work
      mkSp(1L, 2L, 3L, 10L, -122.20, 47.60),  // minor location
      mkSp(2L, 5L, 4L, 100L, -122.40, 47.60)) // user 2: only one location -> dropped
      .toDF("id", "user_id", "location_id", "started_at", "finished_at", "lon", "lat")
    val got = Metrics.commuteDistance(sp)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (u, h, w, d) = got.head
    assert((u, h, w) == ((1L, 0L, 1L)))
    val want = graft.functions.GeoFunctions.haversineMeters(-122.40, 47.60, -122.30, 47.60)
    assert(math.abs(d - want) < 1e-9, s"commute $d vs $want")
  }
}
