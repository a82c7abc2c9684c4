package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LocationMergeTourSpec extends SparkSpec {
  import spark.implicits._

  private def mkSp(rows: (Long, Long, String, String, Double, Double)*) =
    rows.toSeq.toDF("id", "user_id", "s", "f", "lon", "lat")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("lon"), col("lat"))

  test("DBSCAN clusters nearby staypoints per user; noise handling with num_samples") {
    val sp = mkSp(
      // user 1: two clusters of 2 points + 1 isolated
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 09:00:00", 8.5000, 47.3000),
      (1L, 1L, "2023-01-01 10:00:00", "2023-01-01 11:00:00", 8.5001, 47.3001),
      (2L, 1L, "2023-01-01 12:00:00", "2023-01-01 13:00:00", 8.6000, 47.3500),
      (3L, 1L, "2023-01-01 14:00:00", "2023-01-01 15:00:00", 8.6001, 47.3501),
      (4L, 1L, "2023-01-01 16:00:00", "2023-01-01 17:00:00", 8.9000, 47.4000),
      // user 2 at the same coords as user 1's cluster: separate location
      (5L, 2L, "2023-01-01 08:00:00", "2023-01-01 09:00:00", 8.5000, 47.3000))
    val (spOut, locs) = LocationGenerator.generate(sp, LocationGenerator.Params(epsilonMeters = 100, numSamples = 1))
    // num_samples=1: every point is core -> 3 locations for user1, 1 for user2
    assert(locs.filter(col("user_id") === 1L).count() == 3)
    assert(locs.filter(col("user_id") === 2L).count() == 1)
    assert(spOut.filter(col("location_id").isNull).count() == 0)
    // pair (0,1) share a location; (2,3) share another
    val locOf = spOut.select("id", "location_id").as[(Long, Long)].collect().toMap
    assert(locOf(0L) == locOf(1L) && locOf(2L) == locOf(3L) && locOf(0L) != locOf(2L))

    val (spOut2, _) = LocationGenerator.generate(sp, LocationGenerator.Params(epsilonMeters = 100, numSamples = 2))
    // isolated point becomes noise -> null location
    assert(spOut2.filter(col("id") === 4L).select("location_id").first().isNullAt(0))
  }

  test("dataset-level DBSCAN shares locations across users") {
    val sp = mkSp(
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 09:00:00", 8.5000, 47.3000),
      (1L, 2L, "2023-01-01 10:00:00", "2023-01-01 11:00:00", 8.5001, 47.3001),
      (2L, 3L, "2023-01-01 12:00:00", "2023-01-01 13:00:00", 8.9000, 47.4000))
    val (spOut, locs) = LocationGenerator.generate(sp,
      LocationGenerator.Params(epsilonMeters = 100, numSamples = 1, aggLevel = "dataset"))
    val locOf = spOut.select("id", "location_id").as[(Long, Long)].collect().toMap
    assert(locOf(0L) == locOf(1L)) // same place, different users -> same location id
    assert(locOf(0L) != locOf(2L))
    // locations table has one row per (user, location) pair
    assert(locs.count() == 3)
  }

  test("merge_staypoints merges consecutive same-location staypoints unless a tripleg intervenes") {
    val sp = Seq(
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 08:30:00", 100L),
      (1L, 1L, "2023-01-01 08:35:00", "2023-01-01 09:00:00", 100L), // merge with 0
      (2L, 1L, "2023-01-01 09:05:00", "2023-01-01 09:30:00", 100L), // merge chain
      (3L, 1L, "2023-01-01 09:40:00", "2023-01-01 10:00:00", 200L), // different location
      (4L, 1L, "2023-01-01 10:05:00", "2023-01-01 10:30:00", 200L), // tripleg in between -> no merge
      (5L, 1L, "2023-01-01 12:00:00", "2023-01-01 12:30:00", 200L)  // time gap too large
    ).toDF("id", "user_id", "s", "f", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("location_id"))
    val tpls = Seq((0L, 1L, "2023-01-01 10:01:00", "2023-01-01 10:04:00"))
      .toDF("id", "user_id", "s", "f")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"))

    val merged = StaypointMerger.mergeStaypoints(sp, tpls, maxTimeGapMinutes = 10)
    val rows = merged.orderBy("started_at").collect()
    assert(rows.length == 4)
    // run 0-1-2 merged: keeps first id/started, last finished
    assert(rows(0).getAs[Long]("id") == 0L)
    assert(rows(0).getAs[java.sql.Timestamp]("finished_at") == ts("2023-01-01 09:30:00"))
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(0L, 3L, 4L, 5L))
  }

  test("merge_staypoints reference matrix: time boundaries, max gap, agg override") {
    // Port of tests/preprocessing/test_staypoints.py:57-101 (fixture) and
    // :538-601: merge 2,6,15 (user 0) and 7,80 (user 1); 5 stays separate
    // at the default gap (1h45 > 10min) but joins at max_time_gap=2h; an
    // agg entry for a base column (finished_at -> first) overrides it.
    val t1 = "1971-01-01 00:00:00"; val t2 = "1971-01-02 05:00:00"
    val t3 = "1971-01-02 06:45:00"; val t4 = "1971-01-02 08:55:00"
    val t45 = "1971-01-02 08:57:00"; val t5 = "1971-01-02 09:00:00"
    val t6 = "1971-01-02 09:20:00"
    val sp = Seq(
      (1L, 0L, t1, t2, 1L), (5L, 0L, t2, t2, 2L), (2L, 0L, t3, t4, 2L),
      (6L, 0L, t4, t45, 2L), (15L, 0L, t5, t6, 2L),
      (7L, 1L, t3, t4, 2L), (80L, 1L, t45, t5, 2L), (3L, 1L, t5, t6, 4L))
      .toDF("id", "user_id", "s", "f", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("location_id"))
      .withColumn("geom", concat(lit("g"), col("id")))
    val noTpls = Seq.empty[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("id", "user_id", "started_at", "finished_at")

    val merged = StaypointMerger.mergeStaypoints(sp, noTpls, aggExtra = Map("geom" -> "first"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId.size == 5) // len(sp) - 3
    assert(byId.keySet == Set(1L, 5L, 2L, 7L, 3L))
    // merged boundaries: first started_at, last finished_at
    assert(byId(7L).getAs[java.sql.Timestamp]("started_at") == ts(t3))
    assert(byId(7L).getAs[java.sql.Timestamp]("finished_at") == ts(t5))
    assert(byId(2L).getAs[java.sql.Timestamp]("started_at") == ts(t3))
    assert(byId(2L).getAs[java.sql.Timestamp]("finished_at") == ts(t6))
    assert(byId(2L).getAs[String]("geom") == "g2")

    // wider gap budget: 5 joins the user-0 run (1h45 <= 2h)
    val merged2h = StaypointMerger.mergeStaypoints(sp, noTpls, maxTimeGapMinutes = 120)
    val byId2h = merged2h.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId2h.size == 4) // len(sp) - 4
    assert(byId2h(5L).getAs[java.sql.Timestamp]("started_at") == ts(t2))
    assert(byId2h(5L).getAs[java.sql.Timestamp]("finished_at") == ts(t6))

    // agg override of a base column: finished_at takes the FIRST row's value
    val mergedAgg = StaypointMerger.mergeStaypoints(sp, noTpls,
      aggExtra = Map("geom" -> "first", "finished_at" -> "first"))
    val byIdAgg = mergedAgg.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byIdAgg(7L).getAs[java.sql.Timestamp]("finished_at") == ts(t4))
    assert(byIdAgg(2L).getAs[java.sql.Timestamp]("finished_at") == ts(t4))
    assert(byIdAgg(7L).getAs[String]("geom") == "g7")

    // user_id is a reference agg-dict default too (staypoints.py:349): an
    // override must aggregate cleanly instead of colliding with the
    // grouping key (grouping happens on a hidden copy)
    val mergedUid = StaypointMerger.mergeStaypoints(sp, noTpls,
      aggExtra = Map("geom" -> "first", "user_id" -> "last"))
    val byIdUid = mergedUid.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byIdUid.keySet == Set(1L, 5L, 2L, 7L, 3L))
    assert(byIdUid(2L).getAs[Long]("user_id") == 0L)
    assert(byIdUid(7L).getAs[Long]("user_id") == 1L)
  }

  test("tours close when a later trip returns to a candidate's origin (distance mode)") {
    def pt(lon: Double, lat: Double) = (lon, lat)
    val trips = Seq(
      // A->B, B->C, C->A : one tour of 3 trips
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 08:30:00", 0L, 1L, pt(8.50, 47.30), pt(8.52, 47.30)),
      (1L, 1L, "2023-01-01 09:00:00", "2023-01-01 09:30:00", 1L, 2L, pt(8.52, 47.30), pt(8.54, 47.31)),
      (2L, 1L, "2023-01-01 10:00:00", "2023-01-01 10:30:00", 2L, 3L, pt(8.54, 47.31), pt(8.50, 47.30))
    ).toDF("id", "user_id", "s", "f", "origin_staypoint_id", "destination_staypoint_id", "o", "d")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"),
        col("origin_staypoint_id"), col("destination_staypoint_id"),
        struct(
          struct(col("o._1").as("lon"), col("o._2").as("lat")).as("origin"),
          struct(col("d._1").as("lon"), col("d._2").as("lat")).as("destination")).as("geom"))

    val (tripsOut, tours) = TourGenerator.generate(trips, None, TourGenerator.Params(maxDistMeters = 100))
    val t = tours.collect()
    assert(t.length == 1)
    assert(t(0).getSeq[Long](t(0).fieldIndex("trips")) == Seq(0L, 1L, 2L))
    assert(t(0).getAs[java.sql.Timestamp]("started_at") == ts("2023-01-01 08:00:00"))
    assert(t(0).getAs[java.sql.Timestamp]("finished_at") == ts("2023-01-01 10:30:00"))
    // every trip is mapped back to the tour
    assert(tripsOut.filter(col("tour_id").isNotNull).count() == 3)
  }

  test("tours: time budget excludes too-old candidates; spatial gap resets when maxNrGaps=0") {
    def pt(lon: Double, lat: Double) = (lon, lat)
    val trips = Seq(
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 08:30:00", 0L, 1L, pt(8.50, 47.30), pt(8.52, 47.30)),
      // jumps to a far place (spatial gap) then returns to B — candidate list was reset at the gap
      (1L, 1L, "2023-01-01 09:00:00", "2023-01-01 09:30:00", 5L, 6L, pt(8.90, 47.40), pt(8.95, 47.42)),
      (2L, 1L, "2023-01-01 10:00:00", "2023-01-01 10:30:00", 6L, 7L, pt(8.95, 47.42), pt(8.90, 47.40))
    ).toDF("id", "user_id", "s", "f", "origin_staypoint_id", "destination_staypoint_id", "o", "d")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"),
        col("origin_staypoint_id"), col("destination_staypoint_id"),
        struct(
          struct(col("o._1").as("lon"), col("o._2").as("lat")).as("origin"),
          struct(col("d._1").as("lon"), col("d._2").as("lat")).as("destination")).as("geom"))
    val (_, tours) = TourGenerator.generate(trips, None, TourGenerator.Params(maxDistMeters = 100))
    val t = tours.collect()
    // only the 1->2 loop closes (trip 0 was cut off by the spatial gap)
    assert(t.length == 1)
    assert(t(0).getSeq[Long](t(0).fieldIndex("trips")) == Seq(1L, 2L))
  }
}
