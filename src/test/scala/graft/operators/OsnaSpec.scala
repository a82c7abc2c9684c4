package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OSNA semantics (location_identification.py:246-344): frame weighting,
  * per-frame argmax, and the home-beats-work conflict rule with work
  * falling back to its second-best location.
  */
class OsnaSpec extends SparkSpec {
  import spark.implicits._

  // 2023-01-02 is a Monday (weekday frames apply)
  private def sp(rows: (Long, Long, String, String, Long)*) =
    rows.toSeq.toDF("id", "user_id", "s", "f", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("location_id"))

  test("home from rest/leisure frames, work from work frame") {
    val in = sp(
      (0L, 1L, "2023-01-02 03:00:00", "2023-01-02 06:00:00", 100L), // rest  -> home @100
      (1L, 1L, "2023-01-02 20:00:00", "2023-01-02 22:00:00", 100L), // leisure -> home @100
      (2L, 1L, "2023-01-02 09:00:00", "2023-01-02 16:00:00", 200L), // work  -> work @200
      (3L, 1L, "2023-01-02 10:00:00", "2023-01-02 11:00:00", 300L)) // work, shorter
    val out = LocationLabelling.osnaMethod(in)
      .select("location_id", "purpose").distinct().as[(Long, Option[String])].collect().toMap
    assert(out(100L).contains("home"))
    assert(out(200L).contains("work"))
    assert(out(300L).isEmpty)
  }

  test("conflict: one location wins both frames -> home wins, work takes second best") {
    val in = sp(
      // location 100 dominates BOTH home and work frames
      (0L, 1L, "2023-01-02 03:00:00", "2023-01-02 07:00:00", 100L), // rest -> home
      (1L, 1L, "2023-01-02 09:00:00", "2023-01-02 18:00:00", 100L), // work frame, longest
      (2L, 1L, "2023-01-02 10:00:00", "2023-01-02 13:00:00", 200L)) // work frame, second
    val out = LocationLabelling.osnaMethod(in)
      .select("location_id", "purpose").distinct().as[(Long, Option[String])].collect().toMap
    assert(out(100L).contains("home")) // home wins the conflict
    assert(out(200L).contains("work")) // work falls back to the runner-up
  }

  test("weekend-only data yields no labels") {
    val in = sp( // 2023-01-07 is a Saturday
      (0L, 1L, "2023-01-07 09:00:00", "2023-01-07 18:00:00", 100L))
    val out = LocationLabelling.osnaMethod(in).select("purpose").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("tours close via shared location ids (location mode)") {
    def trip(id: Long, s: String, f: String, oSp: Long, dSp: Long) =
      (id, 1L, s, f, oSp, dSp)
    val trips = Seq(
      trip(0L, "2023-01-02 08:00:00", "2023-01-02 08:30:00", 10L, 11L), // loc A -> B
      trip(1L, "2023-01-02 12:00:00", "2023-01-02 12:30:00", 12L, 13L)  // loc B -> A (different sp ids!)
    ).toDF("id", "user_id", "s", "f", "origin_staypoint_id", "destination_staypoint_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"),
        col("origin_staypoint_id"), col("destination_staypoint_id"))
    val sps = Seq((10L, 7L), (11L, 8L), (12L, 8L), (13L, 7L)) // sp -> location
      .toDF("id", "location_id")
    val (_, tours) = TourGenerator.generate(trips, Some(sps))
    val t = tours.collect()
    assert(t.length == 1)
    assert(t(0).getSeq[Long](t(0).fieldIndex("trips")) == Seq(0L, 1L))
    assert(t(0).getAs[Long]("location_id") == 7L) // start/end location recorded
  }
}
