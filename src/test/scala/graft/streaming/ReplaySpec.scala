package graft.streaming

import graft.SparkSpec
import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** The replay harness (the driver-gate bridge for the streaming
  * operators) must (a) reproduce the batch operators' results exactly
  * and (b) be invariant to the micro-batch chunking — same rows whether
  * the stream arrives in 1 batch or one batch per row.
  */
class ReplaySpec extends SparkSpec {
  import spark.implicits._

  private val MIN = 60000000L

  test("replayed sessionize matches the batch operator for every chunking") {
    // 3 users, gaps straddling the 30-minute threshold, duplicate
    // timestamps inside one user to exercise the (t, id) tie-break
    val events = Seq(
      (0L, 1L, 0L), (1L, 1L, 10 * MIN), (2L, 1L, 45 * MIN), (3L, 1L, 46 * MIN),
      (4L, 2L, 5 * MIN), (5L, 2L, 36 * MIN),
      (6L, 3L, 7 * MIN), (7L, 3L, 7 * MIN), (8L, 3L, 90 * MIN))
      .toDF("event_id", "user_id", "t_us")
    val batch = EventOps.sessionize(events, gapMinutes = 30.0, tsCol = "t_us")
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    for (chunks <- Seq(1, 3, 9)) {
      val streamed = Replay.sessionize(events, gapMinutes = 30.0, chunks = chunks)
        .select("event_id", "session_id").as[(Long, Long)].collect().toMap
      assert(streamed == batch, s"chunks=$chunks")
    }
    assert(batch(2L) == 1L && batch(5L) == 1L && batch(8L) == 1L)
  }

  test("replayed staypoints match the batch scan, tail flushed like includeLast") {
    // user 1: 4-fix dwell at the origin (35 min > threshold), a transit
    // fix 200 m east (breach), then a 3-fix tail dwell that only the
    // includeLast sentinel flush can emit; user 2: all-transit, no output
    def lon(m: Double) = -122.4 + m / 74000.0 // ≈ metres at lat 47.6
    val pfs = Seq(
      (0L, 1L, 0L, lon(0), 47.6), (1L, 1L, 10 * MIN, lon(10), 47.6),
      (2L, 1L, 20 * MIN, lon(20), 47.6), (3L, 1L, 35 * MIN, lon(5), 47.6),
      (4L, 1L, 40 * MIN, lon(200), 47.6),
      (5L, 1L, 45 * MIN, lon(400), 47.6), (6L, 1L, 60 * MIN, lon(410), 47.6),
      (7L, 1L, 80 * MIN, lon(390), 47.6),
      (10L, 2L, 0L, lon(0), 47.0), (11L, 2L, 20 * MIN, lon(500), 47.0))
      .toDF("id", "user_id", "t_us", "lon", "lat")
    val params = StreamingStaypoints.Params(distThresholdMeters = 100.0,
      timeThresholdMinutes = 30.0, gapThresholdMinutes = 1e7)
    val expected = Set(
      (1L, 0L, 40 * MIN, 4L),        // dwell closed by the transit breach
      (1L, 45 * MIN, 80 * MIN, 3L))  // tail dwell, sentinel-flushed
    for (chunks <- Seq(1, 4)) {
      val got = Replay.staypoints(pfs, params, chunks = chunks)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"chunks=$chunks: $got")
    }
  }

  test("replayed dedup flags first-seen by id order, invariant to chunking") {
    val docs = Seq(
      (10L, "alpha"), (11L, "beta"), (12L, "alpha"), // dup across chunk boundary
      (13L, "gamma"), (14L, "beta"), (15L, "alpha"))
      .toDF("doc_id", "text")
    for (chunks <- Seq(1, 3, 6)) {
      val got = Replay.dedup(docs, chunks = chunks)
        .select("doc_id", "is_first", "first_doc_id")
        .as[(Long, Boolean, Long)].collect().toSet
      assert(got == Set(
        (10L, true, 10L), (11L, true, 11L), (12L, false, 10L),
        (13L, true, 13L), (14L, false, 11L), (15L, false, 10L)), s"chunks=$chunks: $got")
    }
  }

  test("replayed near-dup candidates equal the batch banding collisions for every chunking") {
    // two literal clones (collide in every band) + one unrelated doc;
    // the pair must be emitted once per colliding band regardless of
    // whether the clones arrive in the same or different micro-batches
    val docs = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"),
      (21L, "completely unrelated text about spark joins and windows"),
      (22L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val expected = (0 until 16).map(b => (20L, 22L, b)).toSet
    for (chunks <- Seq(1, 2, 3)) {
      val got = Replay.nearDup(docs, numHashes = 64, bands = 16, chunks = chunks)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected, s"chunks=$chunks: $got")
    }
  }

  test("verified near-dup replay equals the batch minHashLsh pair set for every chunking") {
    // two exact clones (jaccard 1.0, all bands collide), one near-clone
    // of 20 that should survive a 0.5 threshold if banding catches it,
    // and one unrelated doc; the streaming verify stage must emit the
    // SAME (pair, jaccard) rows batch minHashLsh produces — once per
    // pair, whichever micro-batch the later clone arrived in
    val docs = Seq(
      (20L, "the quick brown fox jumps over the lazy dog again and again"),
      (21L, "completely unrelated text about spark joins and windows"),
      (22L, "the quick brown fox jumps over the lazy dog again and again"),
      (23L, "the quick brown fox jumps over the lazy dog again and once"))
      .toDF("doc_id", "text")
    val expected = graft.operators.Dedup.minHashLsh(docs,
        numHashes = 64, bands = 16, shingleN = 3, verifyThreshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.exists(_._3 == 1.0), s"fixture must contain an exact clone pair: $expected")
    for (chunks <- Seq(1, 2, 4)) {
      val got = Replay.nearDupVerified(docs, numHashes = 64, bands = 16,
          shingleN = 3, verifyThreshold = 0.5, chunks = chunks)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"chunks=$chunks: $got vs $expected")
    }
  }

  test("replayed interval join equals the batch containment join for every chunking") {
    // events and labels per user, with (a) an event inside two
    // overlapping intervals, (b) one outside every interval, (c) an
    // event whose matching label lands in a LATER replay chunk (the
    // cross-batch state-retention path), (d) a zero-length interval
    val events = Seq(
      (0L, 1L, 5 * MIN), (1L, 1L, 50 * MIN), (2L, 1L, 300 * MIN),
      (3L, 2L, 10 * MIN), (4L, 2L, 70 * MIN))
      .toDF("event_id", "user_id", "t_us")
    val labels = Seq(
      (10L, 1L, 0L, 60 * MIN, 7L), (11L, 1L, 40 * MIN, 90 * MIN, 8L),
      (12L, 1L, 200 * MIN, 200 * MIN, 9L), // zero-length: matches nothing
      (13L, 2L, 60 * MIN, 120 * MIN, 6L))
      .toDF("label_id", "user_id", "s_us", "f_us", "label")
    val expected = events.as("e").join(labels.as("l"),
        col("e.user_id") === col("l.user_id") &&
          col("e.t_us") >= col("l.s_us") && col("e.t_us") < col("l.f_us"))
      .select(col("event_id"), col("label_id")).as[(Long, Long)].collect().toSet
    assert(expected === Set((0L, 10L), (1L, 10L), (1L, 11L), (4L, 13L)))
    for (chunks <- Seq(1, 2, 4)) {
      val got = Replay.intervalJoin(events, labels, maxDurationMinutes = 120, chunks = chunks)
        .select(col("event_id"), col("label_id")).as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"chunks=$chunks: duplicate rows")
      assert(got.toSet === expected, s"chunks=$chunks")
    }
  }

  test("empty input yields an empty, correctly-typed frame") {
    val events = Seq.empty[(Long, Long, Long)].toDF("event_id", "user_id", "t_us")
    val out = Replay.sessionize(events)
    assert(out.columns.toSeq == Seq("event_id", "user_id", "session_id"))
    assert(out.count() == 0L)
  }

  test("interval join replay tolerates empty feeds at every chunking") {
    // r14 advice: chunk-boundary computation indexed times(0) of an
    // empty Seq when both feeds were empty and chunks >= 2
    val events = Seq.empty[(Long, Long, Long)].toDF("event_id", "user_id", "t_us")
    val labels = Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("label_id", "user_id", "s_us", "f_us", "label")
    for (chunks <- Seq(1, 2, 4)) {
      val out = Replay.intervalJoin(events, labels, maxDurationMinutes = 120, chunks = chunks)
      assert(out.columns.toSeq == Seq("event_id", "user_id", "t_us", "label_id", "label"),
        s"chunks=$chunks")
      assert(out.count() == 0L, s"chunks=$chunks")
    }
  }
}
