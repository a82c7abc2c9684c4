package graft.operators

import graft.SparkSpec

/** [[EventOps.seasonalDecompose]]: x48 integer classical decomposition
  * against a sequential replay, plus the crisp invariants — a constant
  * series has a zero seasonal profile, and missing hours are genuine
  * zeros in the spine (not window skips).
  */
class SeasonalDecomposeSpec extends SparkSpec {
  import spark.implicits._

  private val hourUs = 3600000000L

  /** One event row per unit of count c at hour h. */
  private def series(counts: Seq[(Long, Long)], tpe: String = "x"): Seq[(String, Long, Long)] =
    counts.flatMap { case (h, c) =>
      (0L until c).map(i => (tpe, h * 97 + i, h * hourUs + i))
    }

  /** Sequential reference: same x48 arithmetic, same truncation. */
  private def reference(counts: Map[Long, Long]): Map[Long, (Long, Long, Long)] = {
    val h0 = counts.keys.min; val h1 = counts.keys.max
    val dense = (h0 to h1).map(h => counts.getOrElse(h, 0L)).toArray
    val rows = for {
      i <- dense.indices if i >= 12 && i + 12 < dense.length
      t48 = dense(i - 12) + 2 * (i - 11 to i + 11).map(dense).sum + dense(i + 12)
    } yield ((h0 + i) % 24, 48 * dense(i) - t48)
    rows.groupBy(_._1).map { case (hod, g) =>
      val s = g.map(_._2).sum; val n = g.size.toLong
      val mag = math.abs(s) * 1000000L / (48L * n)
      hod -> (n, s, if (s >= 0) mag else -mag)
    }
  }

  test("constant series decomposes to an all-zero seasonal profile") {
    val ev = series((0L until 72L).map(h => (h, 3L))).toDF("event_type", "event_id", "t_us")
    val got = EventOps.seasonalDecompose(ev).collect()
    assert(got.length == 24) // 72 hours, 48 full-window rows cover all 24 hods
    got.foreach { r =>
      assert(r.getAs[Long]("sum_detrended48") == 0L, r.toString)
      assert(r.getAs[Long]("seasonal_ppm") == 0L, r.toString)
    }
  }

  test("spiky series matches the sequential x48 reference exactly") {
    val counts = (0L until 96L).map(h => h -> (5L + (if (h % 24 == 5) 7L else 0L)
      + (if (h % 7 == 0) 2L else 0L))).toMap
    val ev = series(counts.toSeq).toDF("event_type", "event_id", "t_us")
    val want = reference(counts)
    val got = EventOps.seasonalDecompose(ev).collect()
      .map(r => r.getAs[Long]("hour_of_day") ->
        ((r.getAs[Long]("n_obs"), r.getAs[Long]("sum_detrended48"), r.getAs[Long]("seasonal_ppm"))))
      .toMap
    assert(got == want)
  }

  test("missing hours are zeros in the spine, not skipped rows") {
    // hours 0..47 with hour 20 completely absent
    val counts = (0L until 48L).filter(_ != 20L).map(h => h -> 4L).toMap
    val ev = series(counts.toSeq).toDF("event_type", "event_id", "t_us")
    val want = reference(counts) // reference zero-fills by construction
    val got = EventOps.seasonalDecompose(ev).collect()
      .map(r => r.getAs[Long]("hour_of_day") ->
        ((r.getAs[Long]("n_obs"), r.getAs[Long]("sum_detrended48"), r.getAs[Long]("seasonal_ppm"))))
      .toMap
    assert(got == want)
    // the absent hour must depress its own hod's seasonal below zero
    assert(want(20L)._3 < 0L && got(20L)._3 < 0L)
  }

  test("types decompose independently") {
    val a = series((0L until 30L).map(h => (h, 2L)), "a")
    val b = series((0L until 30L).map(h => (h, 9L)), "b")
    val got = EventOps.seasonalDecompose((a ++ b).toDF("event_type", "event_id", "t_us"))
      .select("event_type").distinct().as[String].collect().toSet
    assert(got == Set("a", "b"))
  }
}
