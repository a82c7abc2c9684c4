package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Banded interval-join execution must reproduce the per-user range join
  * exactly — bands are a join strategy, not a semantic.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // layouts chosen to hit the banding edges: spans many bands, exact
  // band-boundary touch (no overlap under the strict predicate),
  // zero-length interval, nested and chained overlaps, multiple users
  private val left = Seq(
    (0L, 1L, "2023-01-01 00:00:00", "2023-01-10 00:00:00"), // spans many 1h bands
    (2L, 1L, "2023-01-01 05:00:00", "2023-01-01 06:00:00"), // ends on a band edge
    (4L, 1L, "2023-01-02 12:30:00", "2023-01-02 12:30:00"), // zero length
    (6L, 2L, "2023-01-01 00:00:00", "2023-01-01 04:00:00"),
    (8L, 3L, "2023-06-15 10:15:00", "2023-06-15 11:45:00")
  ).map { case (id, u, s, f) => (id, u, ts(s), ts(f)) }
    .toDF("id", "user_id", "started_at", "finished_at")

  private val right = Seq(
    (1L, 1L, "2023-01-01 06:00:00", "2023-01-01 07:00:00"), // touches 2's end exactly
    (3L, 1L, "2023-01-03 00:00:00", "2023-01-05 00:00:00"), // inside 0
    (5L, 1L, "2023-01-02 12:00:00", "2023-01-02 13:00:00"), // contains the zero-length 4
    (7L, 2L, "2023-01-01 03:59:59", "2023-01-01 09:00:00"),
    (9L, 3L, "2023-06-15 11:00:00", "2023-06-15 12:00:00"),
    (11L, 2L, "2022-12-31 00:00:00", "2023-01-01 00:00:01")
  ).map { case (id, u, s, f) => (id, u, ts(s), ts(f)) }
    .toDF("id", "user_id", "started_at", "finished_at")

  private def collectMatches(bandMinutes: Option[Double]): Set[(Long, Long, Long)] =
    IntervalJoin.bestOverlapMatch(left, right, bandMinutes = bandMinutes)
      .collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("user_id"), r.getAs[Long]("right_id")))
      .toSet

  test("banded execution matches the per-user range join across band widths") {
    val reference = collectMatches(None)
    assert(reference.nonEmpty)
    for (band <- Seq(60.0, 1440.0, 10080.0, 525600.0)) {
      assert(collectMatches(Some(band)) == reference, s"band=$band min")
    }
  }

  test("band-boundary touch is not an overlap; containment of a point interval is") {
    val m = collectMatches(Some(60.0)).map(t => t._1 -> t._3).toMap
    assert(!m.contains(2L)) // [05:00,06:00) vs [06:00,07:00): strict predicate
    assert(m.get(4L).contains(5L)) // zero-length inside 5's interval
    assert(m.get(0L).contains(3L)) // multi-band span still pairs exactly once
  }
}
