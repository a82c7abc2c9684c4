package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Port of the reference tour-generation tests around the gap budget and
  * time budget (tests/preprocessing/test_trips.py:144-240, fixture at
  * :11-121): a spatial discontinuity between consecutive trips is a
  * "gap"; with max_nr_gaps=1 a tour may bridge one gap, so user 1's
  * out-and-back with a mid-sequence jump closes into a tour that
  * max_nr_gaps=0 rejects.
  */
class TourGapSpec extends SparkSpec {
  import spark.implicits._

  // staypoint geometries (fixture sp_geom_mapping); sp7 is far away
  private val spGeom: Map[Long, (Double, Double)] = Map(
    1L -> (8.5067847, 47.4), 2L -> (8.5067847, 47.40001),
    3L -> (8.5067847, 47.6), 4L -> (8.5067847, 47.7),
    5L -> (8.5067847, 47.399), 6L -> (8.5067847, 47.60001),
    7L -> (9.5067847, 47.20001))

  private val t1 = "1971-01-01 00:00:00"
  private val t2 = "1971-01-01 05:00:00"
  private val t3 = "1971-01-02 07:00:00"
  private val t4 = "1971-01-02 08:00:00"
  private val t5 = "1971-01-02 09:00:00"
  private val t6 = "1971-01-02 10:00:00"

  /** (id, user, start, finish, origin sp, destination sp) — fixture rows. */
  private val tripRows = Seq(
    (1L, 0L, t1, t2, 1L, 2L),   // loop
    (5L, 0L, t2, t2, 2L, 3L),   // not part of a tour
    (2L, 0L, t3, t4, 3L, 4L),   // long tour
    (6L, 0L, t4, t5, 4L, 5L),
    (15L, 0L, t5, t6, 5L, 6L),
    (7L, 1L, t3, t4, 3L, 5L),   // user 1: gap in tour
    (80L, 1L, t4, t5, 4L, 3L),
    (3L, 1L, t5, t6, 1L, 7L))   // no tour

  // Geometry lookup happens driver-side (plain collection map): a Dataset
  // .map lambda touching an instance val would capture the whole spec,
  // which is not serializable (holds the scalatest Engine).
  private def mkTrips: DataFrame =
    tripRows
      .map { case (id, user, s, f, o, d) =>
        val (olon, olat) = spGeom(o)
        val (dlon, dlat) = spGeom(d)
        (id, user, s, f, o, d, olon, olat, dlon, dlat)
      }
      .toDF("id", "user_id", "s", "f",
        "origin_staypoint_id", "destination_staypoint_id", "olon", "olat", "dlon", "dlat")
      .select(col("id"), col("user_id"),
        to_timestamp(col("s")).as("started_at"), to_timestamp(col("f")).as("finished_at"),
        col("origin_staypoint_id"), col("destination_staypoint_id"),
        struct(
          struct(col("olon").as("lon"), col("olat").as("lat")).as("origin"),
          struct(col("dlon").as("lon"), col("dlat").as("lat")).as("destination")).as("geom"))

  // fixture sp_locs: staypoint -> location
  private def mkSpLocs: DataFrame =
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 1L), (6L, 2L), (7L, 4L))
      .toDF("id", "location_id")

  test("generate_tours baseline (gaps=0): loop tour + long tour, none for user 1") {
    val (tripsOut, tours) = TourGenerator.generate(mkTrips, None, TourGenerator.Params())
    val byId = tours.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId.size == 2)
    val tourOf = tripsOut.filter(col("tour_id").isNotNull)
      .select(col("id"), col("tour_id")).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(tourOf(1L) == Seq(0L))
    assert(tourOf(2L) == Seq(1L) && tourOf(6L) == Seq(1L) && tourOf(15L) == Seq(1L))
    // user 1 trips carry no tour id
    assert(tripsOut.filter(col("user_id") === 1L && col("tour_id").isNotNull).count() == 0)
  }

  test("max_nr_gaps=1 bridges one spatial discontinuity (test_tours_with_gap)") {
    val (tripsOut, tours) = TourGenerator.generate(mkTrips, None,
      TourGenerator.Params(maxNrGaps = 1))
    assert(tours.count() == 3)
    val tourOf = tripsOut.filter(col("tour_id").isNotNull)
      .select(col("id"), col("tour_id")).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Long](1)).toMap
    assert(tourOf(7L) == Seq(2L))
    assert(tourOf(80L) == Seq(2L))
    // the gap tour's members and boundaries
    val gapTour = tours.filter(col("id") === 2L).collect()(0)
    assert(gapTour.getSeq[Long](gapTour.fieldIndex("trips")) == Seq(7L, 80L))
    assert(gapTour.getAs[java.sql.Timestamp]("started_at") == ts(t3))
    assert(gapTour.getAs[java.sql.Timestamp]("finished_at") == ts(t5))
  }

  test("tour boundaries equal first trip start / last trip finish (test_tour_times)") {
    val (_, tours) = TourGenerator.generate(mkTrips, None,
      TourGenerator.Params(maxNrGaps = 1, maxTimeDays = 1.0))
    val grouped = TourGenerator.getTripsGrouped(mkTrips, tours)
      .groupBy(col("tour_id"))
      .agg(min(col("started_at")).as("gs"), max(col("finished_at")).as("gf"))
    val joined = tours.join(grouped, tours("id") === grouped("tour_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[java.sql.Timestamp]("started_at") == r.getAs[java.sql.Timestamp]("gs"))
      assert(r.getAs[java.sql.Timestamp]("finished_at") == r.getAs[java.sql.Timestamp]("gf"))
      val spanUs = r.getAs[java.sql.Timestamp]("gf").getTime - r.getAs[java.sql.Timestamp]("gs").getTime
      assert(spanUs > 0 && spanUs < 86400000L)
    }
  }

  test("location mode with max_nr_gaps=1 (test_tours_locations)") {
    val (_, tours) = TourGenerator.generate(mkTrips, Some(mkSpLocs),
      TourGenerator.Params(maxNrGaps = 1))
    val rows = tours.orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("location_id")).toSeq == Seq(1L, 2L, 2L))
    // tour origin/destination staypoints match the member slice boundaries
    val grouped = TourGenerator.getTripsGrouped(mkTrips, tours)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("tour_id").orderBy("started_at")
    val ends = grouped
      .withColumn("_first_o", first(col("origin_staypoint_id")).over(w))
      .groupBy(col("tour_id"))
      .agg(min(col("_first_o")).as("go"), max_by(col("destination_staypoint_id"), col("finished_at")).as("gd"))
    val joined = tours.join(ends, tours("id") === ends("tour_id")).collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("origin_staypoint_id") == r.getAs[Long]("go"))
      assert(r.getAs[Long]("destination_staypoint_id") == r.getAs[Long]("gd"))
    }
  }

  test("distance mode dispatches to euclidean for a projected CRS (_check_max_dist)") {
    // Coordinates in meters: an out-and-back whose endpoints sit 30-40 m
    // apart. Euclidean links it into one tour; misread as degrees,
    // haversine puts every pair thousands of km apart and links nothing.
    val rows = Seq(
      (1L, 0L, t1, t2, 1L, 2L, 0.0, 0.0, 5000.0, 0.0),
      (2L, 0L, t2, t3, 3L, 4L, 5000.0, 30.0, 40.0, 0.0))
    def frame(crs: Option[String]): DataFrame = {
      val base = rows
        .toDF("id", "user_id", "s", "f", "origin_staypoint_id", "destination_staypoint_id",
          "olon", "olat", "dlon", "dlat")
        .select(col("id"), col("user_id"),
          to_timestamp(col("s")).as("started_at"), to_timestamp(col("f")).as("finished_at"),
          col("origin_staypoint_id"), col("destination_staypoint_id"),
          struct(
            struct(col("olon").as("lon"), col("olat").as("lat")).as("origin"),
            struct(col("dlon").as("lon"), col("dlat").as("lat")).as("destination")).as("geom"))
      crs.fold(base)(c => graft.functions.GeoFunctions.withCrs(base, c, Seq("geom")))
    }
    val params = TourGenerator.Params(maxTimeDays = 2.0)
    val (_, planarTours) = TourGenerator.generate(frame(Some("EPSG:2056")), None, params)
    assert(planarTours.count() == 1)
    val (_, geoTours) = TourGenerator.generate(frame(None), None, params)
    assert(geoTours.count() == 0)
  }

  test("time budget crops candidates (test_tour_max_time)") {
    val (_, tours2h) = TourGenerator.generate(mkTrips, None,
      TourGenerator.Params(maxTimeDays = 2.0 / 24.0))
    assert(tours2h.count() == 0) // the 5h loop and 3h tour both exceed 2h
    val (_, tours3h) = TourGenerator.generate(mkTrips, None,
      TourGenerator.Params(maxTimeDays = 3.0 / 24.0))
    assert(tours3h.count() == 1) // the 3h tour fits exactly; the 5h loop does not
  }
}
