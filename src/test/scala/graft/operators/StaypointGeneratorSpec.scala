package graft.operators

import graft.SparkSpec
import graft.functions.GeoFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Fixture-driven semantics checks for the sliding staypoint detector,
  * mirroring the reference behavior (positionfixes.py:478-535): emission
  * on distance breach with sufficient dwell, gap reset without emission,
  * include_last tail handling, centroid over unique member coordinates.
  */
class StaypointGeneratorSpec extends SparkSpec {
  import spark.implicits._

  // ~0.0009° lat ≈ 100 m; points A (dwell), B (dwell 300m away)
  private def pfs(rows: (Long, Long, String, Double, Double)*) =
    rows.toSeq.toDF("id", "user_id", "t", "lon", "lat")
      .select(col("id"), col("user_id"), to_timestamp(col("t")).as("tracked_at"), col("lon"), col("lat"))

  test("basic dwell then move emits one staypoint; finished_at is the breaching fix time") {
    val in = pfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.30000),
      (1L, 1L, "2023-01-01 08:10:00", 8.5001, 47.30001),
      (2L, 1L, "2023-01-01 08:20:00", 8.5000, 47.30002),
      (3L, 1L, "2023-01-01 08:30:00", 8.5100, 47.31000)) // ~1.3 km away -> breach
    val (pfsOut, sp) = StaypointGenerator.generate(in,
      StaypointGenerator.Params(distThresholdMeters = 100, timeThresholdMinutes = 5, gapThresholdMinutes = 60))
    val rows = sp.collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[java.sql.Timestamp]("started_at") == ts("2023-01-01 08:00:00"))
    assert(r.getAs[java.sql.Timestamp]("finished_at") == ts("2023-01-01 08:30:00")) // breach fix time
    // membership covers fixes 0..2 only (not the breaching fix)
    val linked = pfsOut.filter(col("staypoint_id").isNotNull).select("id").as[Long].collect().sorted
    assert(linked.toSeq == Seq(0L, 1L, 2L))
    // centroid near the dwell cluster, not pulled to the breach point
    assert(GeoFunctions.haversineMeters(r.getAs[Double]("lon"), r.getAs[Double]("lat"), 8.5, 47.3) < 50)
  }

  test("zero thresholds with include_last: every fix becomes its own staypoint (reference test_sliding_min)") {
    val in = pfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.3000),
      (1L, 1L, "2023-01-01 08:10:00", 8.5100, 47.3100),
      (2L, 1L, "2023-01-01 08:20:00", 8.5200, 47.3200),
      (3L, 2L, "2023-01-01 09:00:00", 8.6000, 47.4000))
    val (pfsOut, sp) = StaypointGenerator.generate(in,
      StaypointGenerator.Params(distThresholdMeters = 0, timeThresholdMinutes = 0,
        gapThresholdMinutes = 1e7, includeLast = true))
    assert(sp.count() == 4, "dist=0,time=0,include_last => one staypoint per fix")
    assert(pfsOut.filter(col("staypoint_id").isNull).count() == 0)
  }

  test("unreachable thresholds: empty staypoints, every pf link null (reference test_sliding_max/missing_link)") {
    val in = pfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.3000),
      (1L, 1L, "2023-01-01 08:10:00", 8.5001, 47.3001),
      (2L, 1L, "2023-01-01 08:20:00", 8.5002, 47.3002))
    val (pfsOut, sp) = StaypointGenerator.generate(in,
      StaypointGenerator.Params(distThresholdMeters = Double.MaxValue,
        timeThresholdMinutes = 1e15, gapThresholdMinutes = 1e7, includeLast = true))
    assert(sp.count() == 0)
    assert(pfsOut.count() == 3 && pfsOut.filter(col("staypoint_id").isNotNull).count() == 0)
  }

  test("dwell shorter than time threshold emits nothing") {
    val in = pfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.3000),
      (1L, 1L, "2023-01-01 08:02:00", 8.5001, 47.3000),
      (2L, 1L, "2023-01-01 08:03:00", 8.5100, 47.3100))
    val (_, sp) = StaypointGenerator.generate(in,
      StaypointGenerator.Params(distThresholdMeters = 100, timeThresholdMinutes = 5, gapThresholdMinutes = 60))
    assert(sp.count() == 0)
  }

  test("a gap larger than gap_threshold resets without emitting") {
    val in = pfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.3000),
      (1L, 1L, "2023-01-01 08:10:00", 8.5001, 47.3000),
      // 3h gap: candidate [0,1] discarded even though dwell >= threshold
      (2L, 1L, "2023-01-01 11:10:00", 8.5000, 47.3000),
      (3L, 1L, "2023-01-01 11:20:00", 8.5001, 47.3000),
      (4L, 1L, "2023-01-01 11:30:00", 8.5100, 47.3100)) // breach closes [2,3]
    val (_, sp) = StaypointGenerator.generate(in,
      StaypointGenerator.Params(distThresholdMeters = 100, timeThresholdMinutes = 5, gapThresholdMinutes = 15))
    val rows = sp.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[java.sql.Timestamp]("started_at") == ts("2023-01-01 11:10:00"))
  }

  test("include_last aggregates the tail including the final fix") {
    val in = pfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.3000),
      (1L, 1L, "2023-01-01 08:10:00", 8.5001, 47.3000),
      (2L, 1L, "2023-01-01 08:20:00", 8.5000, 47.3001))
    val (without, spNo) = (StaypointGenerator.generate(in,
      StaypointGenerator.Params(timeThresholdMinutes = 5, includeLast = false)))
    assert(spNo.count() == 0)
    val (pfsOut, spYes) = StaypointGenerator.generate(in,
      StaypointGenerator.Params(timeThresholdMinutes = 5, includeLast = true))
    val rows = spYes.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[java.sql.Timestamp]("finished_at") == ts("2023-01-01 08:20:00"))
    // tail staypoint includes ALL remaining fixes
    assert(pfsOut.filter(col("staypoint_id").isNotNull).count() == 3)
    val _ = without
  }

  test("users are independent; ids are dense in (user, time) order") {
    val in = pfs(
      (10L, 2L, "2023-01-01 08:00:00", 8.6000, 47.4000),
      (11L, 2L, "2023-01-01 08:10:00", 8.6001, 47.4000),
      (12L, 2L, "2023-01-01 08:30:00", 8.6100, 47.4100),
      (0L, 1L, "2023-01-01 09:00:00", 8.5000, 47.3000),
      (1L, 1L, "2023-01-01 09:10:00", 8.5001, 47.3000),
      (2L, 1L, "2023-01-01 09:30:00", 8.5100, 47.3100))
    val (_, sp) = StaypointGenerator.generate(in,
      StaypointGenerator.Params(timeThresholdMinutes = 5, gapThresholdMinutes = 60))
    val got = sp.select("id", "user_id").as[(Long, Long)].collect().sortBy(_._1)
    // user 1 sorts first despite tracking later -> gets id 0
    assert(got.toSeq == Seq((0L, 1L), (1L, 2L)))
  }

  test("duplicate positionfixes are excluded before detection") {
    val in = pfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.3000),
      (0L, 1L, "2023-01-01 08:00:00", 8.5000, 47.3000), // exact duplicate row
      (1L, 1L, "2023-01-01 08:10:00", 8.5001, 47.3000),
      (2L, 1L, "2023-01-01 08:30:00", 8.5100, 47.3100))
    val (pfsOut, sp) = StaypointGenerator.generate(in,
      StaypointGenerator.Params(timeThresholdMinutes = 5, gapThresholdMinutes = 60))
    assert(sp.count() == 1)
    assert(pfsOut.count() == 3) // dedup applied
  }

  test("single-partition and many-partition runs agree (the n_jobs equivalence test)") {
    val base = (0 until 200).map { i =>
      val user = (i % 5).toLong
      val block = i / 5 // shared timeline per user
      val atPlace = block % 10 < 7
      val lon = if (atPlace) 8.5 + (block / 10) * 0.02 else 8.5 + (block / 10) * 0.02 + 0.005
      (i.toLong, user, f"2023-01-01 ${8 + block / 12}%02d:${(block * 5) % 60}%02d:00", lon, 47.3)
    }
    val in = pfs(base: _*)
    val one = StaypointGenerator.generate(in.coalesce(1), StaypointGenerator.Params(timeThresholdMinutes = 1))._2
    val many = StaypointGenerator.generate(in.repartition(7), StaypointGenerator.Params(timeThresholdMinutes = 1))._2
    val a = one.orderBy("id").collect().toSeq
    val b = many.orderBy("id").collect().toSeq
    assert(a == b)
  }
}
