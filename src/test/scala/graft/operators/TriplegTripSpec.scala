package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tripleg + trip generation semantics (positionfixes.py:200-458,
  * triplegs.py:12-230): segment boundaries, <2-point removal, trip
  * origin/destination assignment across activities and gaps.
  */
class TriplegTripSpec extends SparkSpec {
  import spark.implicits._

  private def mkPfs(rows: (Long, Long, String, Double, Double, Any)*) =
    rows.toSeq.map { case (id, u, t, lon, lat, sp) =>
      (id, u, t, lon, lat, sp match { case l: Long => Some(l); case _ => None })
    }.toDF("id", "user_id", "t", "lon", "lat", "staypoint_id")
      .select(col("id"), col("user_id"), to_timestamp(col("t")).as("tracked_at"),
        col("lon"), col("lat"), col("staypoint_id"))

  test("triplegs form between staypoints; staypoint fixes are excluded") {
    val in = mkPfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.50, 47.30, 10L),
      (1L, 1L, "2023-01-01 08:10:00", 8.50, 47.30, 10L),
      (2L, 1L, "2023-01-01 08:20:00", 8.51, 47.30, null),
      (3L, 1L, "2023-01-01 08:30:00", 8.52, 47.30, null),
      (4L, 1L, "2023-01-01 08:40:00", 8.53, 47.30, null),
      (5L, 1L, "2023-01-01 08:50:00", 8.54, 47.31, 11L),
      (6L, 1L, "2023-01-01 09:00:00", 8.54, 47.31, 11L))
    val (pfsOut, tpls) = TriplegGenerator.generate(in)
    val t = tpls.collect()
    assert(t.length == 1)
    assert(t(0).getAs[Long]("id") == 0L)
    assert(t(0).getAs[java.sql.Timestamp]("started_at") == ts("2023-01-01 08:20:00"))
    assert(t(0).getAs[java.sql.Timestamp]("finished_at") == ts("2023-01-01 08:40:00"))
    assert(t(0).getSeq[org.apache.spark.sql.Row](t(0).fieldIndex("points")).map(_.getDouble(0)) == Seq(8.51, 8.52, 8.53))
    val linked = pfsOut.filter(col("tripleg_id").isNotNull).select("id").as[Long].collect().sorted
    assert(linked.toSeq == Seq(2L, 3L, 4L))
  }

  test("a temporal gap splits triplegs; single-fix candidates are dropped") {
    val in = mkPfs(
      (0L, 1L, "2023-01-01 08:00:00", 8.50, 47.30, null),
      (1L, 1L, "2023-01-01 08:05:00", 8.51, 47.30, null),
      // 2h gap
      (2L, 1L, "2023-01-01 10:05:00", 8.60, 47.32, null),
      (3L, 1L, "2023-01-01 10:10:00", 8.61, 47.32, null),
      // another gap, then a lone fix (candidate of length 1 -> dropped)
      (4L, 1L, "2023-01-01 12:30:00", 8.70, 47.33, null))
    val (pfsOut, tpls) = TriplegGenerator.generate(in, gapThresholdMinutes = 15)
    assert(tpls.count() == 2)
    assert(pfsOut.filter(col("id") === 4L).select("tripleg_id").first().isNullAt(0))
  }

  test("trips aggregate between activities with origin/destination staypoints") {
    // activity sp(0) -> tpl(0) -> sp(1, non-activity) -> tpl(1) -> activity sp(2)
    val sp = Seq(
      (0L, 1L, "2023-01-01 07:00:00", "2023-01-01 08:00:00", 8.50, 47.30, true),
      (1L, 1L, "2023-01-01 08:30:00", "2023-01-01 08:35:00", 8.52, 47.30, false),
      (2L, 1L, "2023-01-01 09:30:00", "2023-01-01 11:00:00", 8.56, 47.31, true)
    ).toDF("id", "user_id", "s", "f", "lon", "lat", "is_activity")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("lon"), col("lat"), col("is_activity"))
    val tpls = Seq(
      (0L, 1L, "2023-01-01 08:05:00", "2023-01-01 08:25:00", Seq((8.50, 47.30), (8.52, 47.30))),
      (1L, 1L, "2023-01-01 08:40:00", "2023-01-01 09:25:00", Seq((8.52, 47.30), (8.56, 47.31)))
    ).toDF("id", "user_id", "s", "f", "raw")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"),
        expr("transform(raw, p -> struct(p._1 as lon, p._2 as lat))").as("points"))

    val (spOut, tplsOut, trips) = TripGenerator.generate(sp, tpls)
    val t = trips.collect()
    assert(t.length == 1) // one trip: everything between the two activities
    val trip = t(0)
    assert(trip.getAs[Long]("origin_staypoint_id") == 0L)
    assert(trip.getAs[Long]("destination_staypoint_id") == 2L)
    assert(trip.getAs[java.sql.Timestamp]("started_at") == ts("2023-01-01 08:05:00"))
    assert(trip.getAs[java.sql.Timestamp]("finished_at") == ts("2023-01-01 09:25:00"))
    // both triplegs + the intermediate staypoint belong to the trip
    assert(tplsOut.filter(col("trip_id") === trip.getAs[Long]("id")).count() == 2)
    assert(spOut.filter(col("id") === 1L).select("trip_id").as[Long].first() == trip.getAs[Long]("id"))
    // activity staypoints carry prev/next trip ids
    assert(spOut.filter(col("id") === 0L).select("next_trip_id").as[Long].first() == trip.getAs[Long]("id"))
    assert(spOut.filter(col("id") === 2L).select("prev_trip_id").as[Long].first() == trip.getAs[Long]("id"))
  }

  test("a recording gap splits trips and leaves unknown origin/destination") {
    val sp = Seq(
      (0L, 1L, "2023-01-01 07:00:00", "2023-01-01 08:00:00", 8.50, 47.30, true),
      (1L, 1L, "2023-01-01 14:00:00", "2023-01-01 16:00:00", 8.60, 47.32, true)
    ).toDF("id", "user_id", "s", "f", "lon", "lat", "is_activity")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("lon"), col("lat"), col("is_activity"))
    val tpls = Seq(
      // right after activity 0 — its trip has a known origin, gap destination
      (0L, 1L, "2023-01-01 08:05:00", "2023-01-01 08:25:00", Seq((8.50, 47.30), (8.52, 47.30))),
      // hours later (gap) — origin unknown, destination activity 1
      (1L, 1L, "2023-01-01 13:00:00", "2023-01-01 13:50:00", Seq((8.55, 47.31), (8.60, 47.32)))
    ).toDF("id", "user_id", "s", "f", "raw")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"),
        expr("transform(raw, p -> struct(p._1 as lon, p._2 as lat))").as("points"))

    val (_, _, trips) = TripGenerator.generate(sp, tpls, gapThresholdMinutes = 15)
    val t = trips.orderBy("started_at").collect()
    assert(t.length == 2)
    assert(t(0).getAs[Long]("origin_staypoint_id") == 0L)
    assert(t(0).isNullAt(t(0).fieldIndex("destination_staypoint_id")))
    assert(t(1).isNullAt(t(1).fieldIndex("origin_staypoint_id")))
    assert(t(1).getAs[Long]("destination_staypoint_id") == 1L)
    // geometry fallback: trip 0 destination = last point of its last tripleg
    val g0 = t(0).getAs[org.apache.spark.sql.Row]("geom")
    assert(g0.getAs[org.apache.spark.sql.Row]("destination").getDouble(0) == 8.52)
    val g1 = t(1).getAs[org.apache.spark.sql.Row]("geom")
    assert(g1.getAs[org.apache.spark.sql.Row]("origin").getDouble(0) == 8.55)
  }
}
