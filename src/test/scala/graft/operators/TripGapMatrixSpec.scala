package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Port of the reference's trip gap-detection matrix
  * (tests/preprocessing/test_triplegs.py:204-265 with the fixture tables
  * tests/data/trips/{staypoints,triplegs,trips}_gaps.csv, inlined): every
  * documented gap case — gap between activities, gap inside a tripleg
  * chain, gap directly before/after an activity, triplegs with no
  * enclosing activities — must produce exactly the reference's trips with
  * its null origin/destination assignments. Also ports
  * test_only_staypoints_in_trip (trips containing no tripleg are
  * deleted; their members stay unassigned).
  */
class TripGapMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = to_timestamp(lit(s))

  test("reference gap matrix: 11 trips with exact null origin/destination pattern") {
    val sp = Seq(
      (9L, "2010-01-02 01:29", "2010-01-02 20:21"),
      (10L, "2010-01-02 20:31", "2010-01-02 21:29"),
      (59L, "2010-01-09 06:55", "2010-01-09 08:37"),
      (60L, "2010-01-09 09:02", "2010-01-09 19:27"),
      (61L, "2010-01-09 20:42", "2010-01-10 02:02"),
      (62L, "2010-01-10 02:06", "2010-01-10 04:12"),
      (63L, "2010-01-10 04:16", "2010-01-10 04:32"),
      (66L, "2010-01-11 22:10", "2010-01-12 18:35"),
      (67L, "2010-01-12 19:13", "2010-01-12 19:20"),
      (70L, "2010-01-13 20:40", "2010-01-14 00:44"))
      .toDF("id", "s", "f")
      .select(col("id"), lit(1L).as("user_id"),
        to_timestamp(col("s")).as("started_at"), to_timestamp(col("f")).as("finished_at"),
        lit(true).as("is_activity"), lit(1.0).as("lon"), lit(1.0).as("lat"))

    val tpls = Seq(
      (18L, "2010-01-02 20:21", "2010-01-02 20:31"),
      (99L, "2010-01-09 08:37", "2010-01-09 08:41"),
      (100L, "2010-01-09 08:41", "2010-01-09 08:59"),
      (101L, "2010-01-09 08:59", "2010-01-09 09:02"),
      (102L, "2010-01-09 19:27", "2010-01-09 19:28"),
      (103L, "2010-01-09 19:28", "2010-01-09 19:55"),
      (104L, "2010-01-09 19:55", "2010-01-09 19:56"),
      (105L, "2010-01-09 20:19", "2010-01-09 20:20"),
      (106L, "2010-01-09 20:20", "2010-01-09 20:41"),
      (107L, "2010-01-09 20:41", "2010-01-09 20:42"),
      (108L, "2010-01-10 02:02", "2010-01-10 02:06"),
      (109L, "2010-01-10 04:12", "2010-01-10 04:16"),
      (110L, "2010-01-10 04:32", "2010-01-10 04:45"),
      (115L, "2010-01-12 18:35", "2010-01-12 18:37"),
      (116L, "2010-01-12 18:37", "2010-01-12 19:13"),
      (123L, "2010-01-13 18:36", "2010-01-13 18:37"),
      (124L, "2010-01-13 18:37", "2010-01-13 20:39"),
      (125L, "2010-01-13 20:39", "2010-01-13 20:40"),
      (126L, "2010-01-15 20:39", "2010-01-15 20:40"),
      (127L, "2010-01-15 20:44", "2010-01-15 20:50"),
      (128L, "2010-01-17 20:39", "2010-01-17 20:40"))
      .toDF("id", "s", "f")
      .select(col("id"), lit(1L).as("user_id"),
        to_timestamp(col("s")).as("started_at"), to_timestamp(col("f")).as("finished_at"),
        expr("array(struct(1.0d as lon, 1.0d as lat), struct(2.0d as lon, 2.0d as lat))").as("points"))

    val (_, _, trips) = TripGenerator.generate(sp, tpls, gapThresholdMinutes = 15.0)

    val got = trips
      .select(col("id"), col("origin_staypoint_id"), col("destination_staypoint_id"),
        date_format(col("started_at"), "yyyy-MM-dd HH:mm").as("s"),
        date_format(col("finished_at"), "yyyy-MM-dd HH:mm").as("f"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3), r.getString(4)))
      .sortBy(_._1)

    val expected = Seq(
      (0L, Some(9L), Some(10L), "2010-01-02 20:21", "2010-01-02 20:31"),
      (1L, Some(59L), Some(60L), "2010-01-09 08:37", "2010-01-09 09:02"),
      (2L, Some(60L), None, "2010-01-09 19:27", "2010-01-09 19:56"),
      (3L, None, Some(61L), "2010-01-09 20:19", "2010-01-09 20:42"),
      (4L, Some(61L), Some(62L), "2010-01-10 02:02", "2010-01-10 02:06"),
      (5L, Some(62L), Some(63L), "2010-01-10 04:12", "2010-01-10 04:16"),
      (6L, Some(63L), None, "2010-01-10 04:32", "2010-01-10 04:45"),
      (7L, Some(66L), Some(67L), "2010-01-12 18:35", "2010-01-12 19:13"),
      (8L, None, Some(70L), "2010-01-13 18:36", "2010-01-13 20:40"),
      (9L, None, None, "2010-01-15 20:39", "2010-01-15 20:50"),
      (10L, None, None, "2010-01-17 20:39", "2010-01-17 20:40"))

    assert(got.toSeq == expected)
  }

  test("trips with only non-activity staypoints and no tripleg are deleted (test_only_staypoints_in_trip)") {
    // activity, sp, activity, tripleg, sp, activity — hourly, no gaps
    val base = "2021-07-11 0%d:00:00"
    val sp = Seq(
      (0L, 8, 9, true), (1L, 9, 10, false), (2L, 10, 11, true),
      (4L, 12, 13, false), (5L, 13, 14, true))
      .map { case (id, s, f, act) => (id, f"2021-07-11 $s%02d:00:00", f"2021-07-11 $f%02d:00:00", act) }
      .toDF("id", "s", "f", "is_activity")
      .select(col("id"), lit(0L).as("user_id"),
        to_timestamp(col("s")).as("started_at"), to_timestamp(col("f")).as("finished_at"),
        col("is_activity"), lit(0.0).as("lon"), lit(0.0).as("lat"))
    val tpls = Seq((3L, "2021-07-11 11:00:00", "2021-07-11 12:00:00"))
      .toDF("id", "s", "f")
      .select(col("id"), lit(0L).as("user_id"),
        to_timestamp(col("s")).as("started_at"), to_timestamp(col("f")).as("finished_at"),
        expr("array(struct(1.0d as lon, 1.0d as lat), struct(2.0d as lon, 2.0d as lat))").as("points"))

    val (spOut, tplsOut, trips) = TripGenerator.generate(sp, tpls, gapThresholdMinutes = 15.0)
    assert(trips.count() == 1)
    // the first candidate trip (just staypoint 1) had no tripleg -> deleted;
    // only staypoint 4 (in the surviving trip) gets a trip id
    val spTrip = spOut.select(col("id"), col("trip_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(spTrip(1L).isEmpty && spTrip(0L).isEmpty && spTrip(2L).isEmpty && spTrip(5L).isEmpty)
    assert(spTrip(4L) == Some(0L))
    assert(tplsOut.filter(col("trip_id") === 0L).count() == 1)
  }
}
