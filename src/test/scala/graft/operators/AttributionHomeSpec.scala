package graft.operators

import graft.SparkSpec

/** Hand fixtures for [[EventOps.lastTouchAttribution]] and
  * [[LocationLabelling.homeAgreement]].
  */
class AttributionHomeSpec extends SparkSpec {
  import spark.implicits._

  test("last-touch attribution: window, ties, and the unattributed row") {
    val day = 86400000000L
    val ev = Seq(
      // user 1: view then click before the purchase -> click, gap 100
      (1L, 10L, "view", 100L), (1L, 11L, "click", 200L), (1L, 12L, "purchase", 300L),
      // user 2: only touch is older than 7 days -> unattributed
      (2L, 20L, "view", 100L), (2L, 21L, "purchase", 100L + 8 * day),
      // user 3: no touches at all -> unattributed
      (3L, 30L, "purchase", 50L),
      // user 4: two touches at the exact purchase instant -> highest id wins
      (4L, 40L, "view", 100L), (4L, 41L, "click", 100L), (4L, 42L, "purchase", 100L))
      .toDF("user_id", "event_id", "event_type", "t_us")
    val got = EventOps.lastTouchAttribution(ev).collect()
      .map(r => r.getAs[String]("touch_type") ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("sum_gap_us")))).toMap
    assert(got == Map(
      "click" -> ((2L, 100L)),
      "unattributed" -> ((2L, 0L))))
  }

  test("first-touch attribution: earliest in window, lowest-id ties") {
    val day = 86400000000L
    val ev = Seq(
      // user 1: the EARLIEST touch wins -> view, gap 200
      (1L, 10L, "view", 100L), (1L, 11L, "click", 200L), (1L, 12L, "purchase", 300L),
      // user 2: the early view fell out of the 7-day window; the click
      // inside it wins instead
      (2L, 20L, "view", 100L), (2L, 21L, "click", 2 * day), (2L, 22L, "purchase", 8 * day),
      // user 3: equal-timestamp touches at the purchase instant -> LOWEST id (view)
      (3L, 30L, "click", 100L), (3L, 29L, "view", 100L), (3L, 31L, "purchase", 100L),
      // user 4: nothing -> unattributed
      (4L, 40L, "purchase", 77L))
      .toDF("user_id", "event_id", "event_type", "t_us")
    val got = EventOps.firstTouchAttribution(ev).collect()
      .map(r => r.getAs[String]("touch_type") ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("sum_gap_us")))).toMap
    assert(got == Map(
      "view" -> ((2L, 200L)),
      "click" -> ((1L, 6 * day)),
      "unattributed" -> ((1L, 0L))))
  }

  test("first- and last-touch agree when there is a single in-window touch") {
    val ev = Seq(
      (1L, 1L, "view", 50L), (1L, 2L, "purchase", 80L),
      (2L, 3L, "click", 10L), (2L, 4L, "purchase", 99L))
      .toDF("user_id", "event_id", "event_type", "t_us")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(norm(EventOps.firstTouchAttribution(ev)) == norm(EventOps.lastTouchAttribution(ev)))
  }

  test("home agreement: agree, disagree, and the no-OSNA-home exclusion") {
    // Mon 2023-01-02; rest = [02:00, 08:00), work = [08:00, 19:00)
    val sp = Seq(
      // user 1: A is both the dwell max and the rest-weighted max -> agree
      (1L, 100L, ts("2023-01-02 03:00:00"), ts("2023-01-02 05:00:00")),
      (1L, 101L, ts("2023-01-02 09:00:00"), ts("2023-01-02 09:30:00")),
      // user 2: dwell max B is work-only; OSNA home is C -> disagree
      (2L, 200L, ts("2023-01-02 09:00:00"), ts("2023-01-02 15:00:00")),
      (2L, 201L, ts("2023-01-02 03:00:00"), ts("2023-01-02 04:00:00")),
      // user 3: weekend-only (Sat 2023-01-07) -> no OSNA home, excluded
      (3L, 300L, ts("2023-01-07 03:00:00"), ts("2023-01-07 05:00:00")))
      .toDF("user_id", "location_id", "started_at", "finished_at")
    val r = LocationLabelling.homeAgreement(sp).collect().head
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("n_agree") == 1L)
    assert(r.getAs[Long]("agree_ppm") == 500000L)
  }
}
