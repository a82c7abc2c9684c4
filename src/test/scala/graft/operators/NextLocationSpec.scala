package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NextLocationSpec extends SparkSpec {
  import spark.implicits._

  /** (id, user_id, location_id, started_at) — minutes as timestamps. */
  private def visits(rows: (Long, Long, Long)*) = // (user, loc, order)
    rows.zipWithIndex.map { case ((u, l, _), i) =>
      (i.toLong, u, l, ts(f"2023-01-01 ${8 + i / 60}%02d:${i % 60}%02d:00"))
    }.toDF("id", "user_id", "location_id", "started_at")

  test("perfectly periodic movement predicts perfectly") {
    // A-B-A-B-... : 10 visits, train 8, test 2 — both predicted and hit
    val rows = (0 until 10).map(i => (1L, if (i % 2 == 0) 100L else 200L, i.toLong))
    val got = Metrics.nextLocationAccuracy(visits(rows: _*), trainPct = 80)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 2L)))
  }

  test("unseen context counts as test but not predicted; wrong argmax is a miss") {
    // train: A->B twice, A->C once => argmax from A is B (count 2)
    // test: A -> C (predicted B, miss), then C -> Z (context C unseen... C seen: train has C->A)
    val seq1 = Seq( // user 2: A B A C A B | A C  (8 visits, train 6, test 2)
      (2L, 1L, 0L), (2L, 2L, 1L), (2L, 1L, 2L), (2L, 3L, 3L),
      (2L, 1L, 4L), (2L, 2L, 5L), (2L, 1L, 6L), (2L, 3L, 7L))
    val got = Metrics.nextLocationAccuracy(visits(seq1: _*), trainPct = 80)
      .as[(Long, Long, Long, Long)].collect().head
    // test positions 6, 7: visit6 loc=A prev=B (train B->A twice: predicted A -> hit)
    // visit7 loc=C prev=A (train A->B 1, A->C 1 tie -> smallest loc key wins)
    // location keys are min staypoint id per location: A=0, B=1, C=3 -> tie breaks to B...
    // counts from train (pos<6 pairs): A->B x2? pairs: (A,B),(B,A),(A,C),(C,A),(A,B) => A->B 2, A->C 1
    // so pred from A is B, actual C -> miss; n_hits = 1 of 2, both predicted
    assert(got == ((2L, 2L, 2L, 1L)))
  }

  test("first test visit with no predecessor model row counts in n_test but not n_predicted") {
    // user 3: train visits all at A (no transitions from B); test: B then A
    val rows = Seq((3L, 1L, 0L), (3L, 1L, 1L), (3L, 1L, 2L), (3L, 1L, 3L),
      (3L, 2L, 4L)) // 5 visits: train 4, test 1 — test visit prev=A, A->A trained
    val got = Metrics.nextLocationAccuracy(visits(rows: _*), trainPct = 80)
      .as[(Long, Long, Long, Long)].collect().head
    // test visit: loc=B, prev=A, pred=A -> predicted but miss
    assert(got == ((3L, 1L, 1L, 0L)))
  }
}
