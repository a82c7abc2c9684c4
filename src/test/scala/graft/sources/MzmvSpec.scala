package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** read_mzmv semantics over a synthesized survey fixture: trip/tripleg
  * time parsing (24:00:00 clamp, overnight fix), staypoint synthesis from
  * tripleg boundaries, purpose labelling from person coordinates, trip
  * origin/destination wiring and verification-point LineStrings
  * (reference: trackintel/io/dataset_reader.py:369-686).
  */
class MzmvSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("mzmv").toString
    def write(name: String, text: String): Unit =
      Files.write(Paths.get(d, name), text.getBytes("ISO-8859-1"))

    write("wege.csv",
      """HHNR,WEGNR,f51100time,f51400time
        |1,1,08:00:00,09:00:00
        |1,2,23:30:00,24:00:00
        |2,1,10:00:00,09:00:00
        |""".stripMargin)

    // user 1: trip 1 = two triplegs, trip 2 = one; user 2: one tripleg.
    // S_*/Z_* blocks carry start/end location attributes; W_* is home.
    write("etappen.csv",
      """HHNR,WEGNR,ETNR,f51100time,f51400time,f52900,S_X,S_Y,S_X_CH1903,S_Y_CH1903,Z_X,Z_Y,Z_X_CH1903,Z_Y_CH1903,W_X_CH1903,W_Y_CH1903
        |1,1,1,08:00:00,08:30:00,2,8.50,47.40,683000,247000,8.51,47.41,684000,248000,683000,247000
        |1,1,2,08:30:00,09:00:00,3,8.51,47.41,684000,248000,8.52,47.42,685000,249000,683000,247000
        |1,2,3,23:30:00,24:00:00,11,8.52,47.42,685000,249000,8.50,47.40,683000,247000,683000,247000
        |2,1,1,10:00:00,09:00:00,4,7.40,46.90,600000,200000,7.45,46.95,605000,205000,600000,200000
        |""".stripMargin)

    write("zielpersonen.csv",
      """HHNR,A_X_CH1903,A_Y_CH1903,AU_X_CH1903,AU_Y_CH1903
        |1,684000,248000,-997,-997
        |2,-997,-997,-997,-997
        |""".stripMargin)

    // ETNR 1 of user 1 has two valid points and one -997 row
    write("verifikationspunkte.csv",
      """HHNR,ETNR,R1_X,R1_Y,R1_X_CH1903,R1_Y_CH1903,R2_X,R2_Y,R2_X_CH1903,R2_Y_CH1903,R3_X,R3_Y,R3_X_CH1903,R3_Y_CH1903,R4_X,R4_Y,R4_X_CH1903,R4_Y_CH1903,R5_X,R5_Y,R5_X_CH1903,R5_Y_CH1903,R6_X,R6_Y,R6_X_CH1903,R6_Y_CH1903
        |1,1,8.503,47.403,683300,247300,8.507,47.407,683700,247700,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997,-997
        |""".stripMargin)
    d
  }

  private lazy val out = Mzmv.read(spark, dir)

  test("time parsing: 24:00:00 clamps to 23:59:59, overnight trips roll a day") {
    val trips = out.trips.collect().map(r =>
      (r.getAs[Long]("trip_id"), r.getAs[java.sql.Timestamp]("started_at"), r.getAs[java.sql.Timestamp]("finished_at")))
    val w2 = trips.find(_._1 == 1L).get // user 1, WEGNR 2
    assert(w2._3.toInstant.toString == "1970-01-01T23:59:59Z")
    val u2 = trips.find(_._1 == 2L).get // negative duration -> +1 day
    assert(u2._3.toInstant.toString == "1970-01-02T09:00:00Z")
    assert(u2._3.after(u2._2))
  }

  test("staypoint synthesis: one per tripleg start plus one tail per user") {
    val sp = out.staypoints.orderBy("staypoint_id").collect()
    assert(sp.length == 6) // 4 tripleg starts + 2 user tails

    def f(id: Long) = sp.find(_.getAs[Long]("staypoint_id") == id).get
    // user 1, ETNR 1: first of user -> activity, zero-duration staypoint
    assert(f(0).getAs[Boolean]("is_activity"))
    assert(f(0).getAs[java.sql.Timestamp]("started_at") == f(0).getAs[java.sql.Timestamp]("finished_at"))
    assert(f(0).isNullAt(f(0).fieldIndex("prev_trip_id")))
    assert(f(0).getAs[Long]("next_trip_id") == 0L)
    // user 1, ETNR 2: same trip -> not an activity, belongs to trip 0
    assert(!f(1).getAs[Boolean]("is_activity"))
    assert(f(1).getAs[Long]("trip_id") == 0L)
    assert(f(1).isNullAt(f(1).fieldIndex("next_trip_id")))
    // user 1, ETNR 3: trip change -> activity between trip 0 and trip 1,
    // started when the previous tripleg finished
    assert(f(2).getAs[Boolean]("is_activity"))
    assert(f(2).getAs[Long]("prev_trip_id") == 0L)
    assert(f(2).getAs[Long]("next_trip_id") == 1L)
    assert(f(2).getAs[java.sql.Timestamp]("started_at").toInstant.toString == "1970-01-01T09:00:00Z")
    // purpose_tpls of the activity = purpose code of the arriving tripleg
    assert(f(2).getAs[Any]("purpose_tpls").toString == "3")
    // tails: activity, open-ended, prev = last trip of the user
    assert(f(4).getAs[Boolean]("is_activity") && f(4).isNullAt(f(4).fieldIndex("finished_at")))
    assert(f(4).getAs[Long]("prev_trip_id") == 1L)
    assert(f(5).getAs[Long]("prev_trip_id") == 2L)
  }

  test("purpose labels from home/work coordinates; home wins over work") {
    val sp = out.staypoints.orderBy("staypoint_id").collect()
    def purpose(id: Long) = {
      val r = sp.find(_.getAs[Long]("staypoint_id") == id).get
      if (r.isNullAt(r.fieldIndex("purpose"))) null else r.getString(r.fieldIndex("purpose"))
    }
    assert(purpose(0) == "home") // ETNR 1 start == W_ coords
    assert(purpose(1) == "work") // ETNR 2 start == A_ coords
    assert(purpose(3) == "home") // user 2 start == its W_ coords
  }

  test("trips carry origin/destination staypoint ids") {
    val trips = out.trips.collect().map(r => (r.getAs[Long]("trip_id"),
      r.getAs[Long]("origin_staypoint_id"), r.getAs[Long]("destination_staypoint_id"))).toSeq.sorted
    // trip 0 (u1 W1): from sp 0 to the trip-change activity sp 2
    // trip 1 (u1 W2): from sp 2 to the user tail sp 4
    // trip 2 (u2 W1): from sp 3 to its tail sp 5
    assert(trips == Seq((0L, 0L, 2L), (1L, 2L, 4L), (2L, 3L, 5L)))
  }

  test("verification points fold into ordered LineStrings with endpoints") {
    val tpl = out.triplegs.filter("user_id = 1 AND ETNR = 1").collect().head
    val pts = tpl.getSeq[org.apache.spark.sql.Row](tpl.fieldIndex("vp_xy"))
    // S, R1, R2, Z — the -997 points dropped, order preserved
    assert(pts.map(_.getDouble(0)) == Seq(8.50, 8.503, 8.507, 8.51))
    val ch = tpl.getSeq[org.apache.spark.sql.Row](tpl.fieldIndex("vp_xy_ch1903"))
    assert(ch.map(_.getDouble(0)) == Seq(683000.0, 683300.0, 683700.0, 684000.0))
    // tripleg without verification rows still gets its endpoints
    val tpl2 = out.triplegs.filter("user_id = 2 AND ETNR = 1").collect().head
    assert(tpl2.getSeq[org.apache.spark.sql.Row](tpl2.fieldIndex("vp_xy")).length == 2)
  }
}
