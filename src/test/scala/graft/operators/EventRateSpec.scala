package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventRateSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in micros

  test("typeTransitions: lead-pair counts and row-conditional probabilities") {
    val events = Seq(
      (0L, 0L, 1L, "A"), (1L, 10L, 1L, "B"), (2L, 20L, 1L, "A"), (3L, 30L, 1L, "C"),
      (4L, 0L, 2L, "A"), (5L, 10L, 2L, "B")) // u2 adds one more A->B
      .toDF("event_id", "t_us", "user_id", "event_type")
    val got = EventOps.typeTransitions(events)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("A", "B")) == ((2L, 2.0 / 3.0)))
    assert(got(("A", "C")) == ((1L, 1.0 / 3.0)))
    assert(got(("B", "A")) == ((1L, 1.0)))
    assert(got.size == 3)
  }

  test("conversionLatency: last-touch semantics, zero bucket, and no-context exclusion") {
    val S = 1000000L
    val events = Seq(
      (0L, 0L, 1L, "click"), (1L, 10 * S, 1L, "purchase"),        // 10 s -> bucket 3
      (2L, 20 * S, 1L, "click"), (3L, 30 * S, 1L, "click"),
      (4L, 90 * S, 1L, "purchase"),                               // last touch 30 -> 60 s -> bucket 5
      (5L, 100 * S, 1L, "click"), (6L, 100 * S, 1L, "purchase"),  // same micro -> bucket -1
      (7L, 5 * S, 2L, "purchase"))                                // no prior click: excluded
      .toDF("event_id", "t_us", "user_id", "event_type")
    val got = EventOps.conversionLatency(events, "click", "purchase")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(3L -> ((1L, 10L)), 5L -> ((1L, 60L)), -1L -> ((1L, 0L))))
  }

  test("sessionLengthHistogram: bit-length buckets with exact duration mass") {
    val M = 60000000L
    val events = Seq(
      (0L, 0L, 1L), (1L, 10 * M, 1L),      // session of 2, dur 10 min
      (2L, 120 * M, 1L),                   // session of 1, dur 0
      (3L, 0L, 2L), (4L, 5 * M, 2L), (5L, 9 * M, 2L)) // session of 3, dur 9 min
      .toDF("event_id", "t_us", "user_id")
    val got = EventOps.sessionLengthHistogram(
      EventOps.sessionize(events, gapMinutes = 30.0, tsCol = "t_us"), tsCol = "t_us")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((2L, 5L, 19 * M)), // sizes 2 and 3 share bucket 1
      0L -> ((1L, 1L, 0L))))
  }

  test("hourlyAutocorr: a period-2 series reads r=1 at lag 2 and negative at lag 1") {
    // hours 0..9: even hours 3 events, odd hours 1 event
    val events = (0 until 10).flatMap { h =>
      val n = if (h % 2 == 0) 3 else 1
      (0 until n).map(i => (h.toLong * 10 + i, h.toLong * H + i))
    }.toDF("event_id", "t_us")
    val got = EventOps.hourlyAutocorr(events, lags = Seq(1, 2))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == 9L && got(2L)._1 == 8L)
    assert(math.abs(got(2L)._2 - 1.0) < 1e-12)
    assert(got(1L)._2 < -0.99)
  }

  test("userLifespan: firsts, lasts, active days, span and ratio") {
    val D = 86400000000L
    val events = Seq(
      (0L, 5L, 1L), (1L, D + 3L, 1L), (2L, D + 9L, 1L), (3L, 4 * D + 1L, 1L), // days 0,1,1,4
      (4L, 2 * D, 2L))                                                        // single event
      .toDF("event_id", "t_us", "user_id")
    val got = EventOps.userLifespan(events)
      .select("user_id", "first_us", "last_us", "n_events", "n_active_days", "span_days", "activity_ratio")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 5L, 4 * D + 1L, 4L, 3L, 5L, 3.0 / 5.0)))
    assert(got(2L) == ((2L, 2 * D, 2 * D, 1L, 1L, 1L, 1.0)))
  }

  test("rate anomalies: burst bucket flagged, quiet buckets and steady user clean") {
    // user 1: one event in each of hours 0..9, 30 events in hour 10
    val quiet = (0 until 10).map(h => (h.toLong, h * H + 5L, 1L))
    val burst = (0 until 30).map(i => (100L + i, 10 * H + i.toLong, 1L))
    // user 2: perfectly steady — never flagged
    val steady = (0 until 12).map(h => (200L + h, h * H + 7L, 2L))
    val events = (quiet ++ burst ++ steady).toDF("event_id", "t_us", "user_id")
    val got = EventOps.rateAnomalies(events, zThreshold = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (user, bucket, c, n, sc, sc2) = got.head
    assert((user, bucket, c) == ((1L, 10 * H, 30L)))
    assert((n, sc, sc2) == ((11L, 40L, 910L)))
    // the cross-multiplied decision the operator made, replayed exactly
    val dev = c * n - sc
    assert(dev > 0 && dev * dev > 9L * (n * sc2 - sc * sc))
  }

  test("rate anomalies: single-bucket user can never self-flag") {
    val events = (0 until 50).map(i => (i.toLong, i.toLong, 7L))
      .toDF("event_id", "t_us", "user_id")
    assert(EventOps.rateAnomalies(events).count() == 0L)
  }

  test("gapHistogram: bit-length buckets over per-user gaps") {
    // user 1 gaps: 1s, 3s, 8s -> buckets 0, 1, 3
    val events = Seq(
      (0L, 0L, 1L, "click"), (1L, 1000000L, 1L, "click"),
      (2L, 4000000L, 1L, "click"), (3L, 12000000L, 1L, "click"))
      .toDF("event_id", "t_us", "user_id", "event_type")
    val got = EventOps.gapHistogram(events)
      .select("bucket", "n_gaps", "sum_gap_s", "bucket_lo")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(0L -> ((1L, 1L, 1L)), 1L -> ((1L, 3L, 2L)), 3L -> ((1L, 8L, 8L))))
  }

  test("wordEntropy: constant source scores zero, uniform source scores ln k") {
    val docs = Seq(
      (0L, "same same same same", "tpl"), (1L, "same same", "tpl"),
      (2L, "a b c d", "mix")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.wordEntropy(docs)
      .select("source", "n_tokens", "n_types", "entropy_num_q")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("tpl") == ((6L, 1L, 0L))) // n·lnq n − n·lnq n = 0 exactly
    val lnq4 = math.floor(math.log(4.0) * 1e6).toLong
    assert(got("mix") == ((4L, 4L, 4L * lnq4))) // counts of 1: lnq(1)=0
  }

  test("circadianProfile: single-hour user flags nonuniform, round-the-clock user does not") {
    // user 1: 10 events all at hour 3; user 2: one event each hour
    val burst = (0 until 10).map(i => (i.toLong, 3L * H + i, 1L))
    val clock = (0 until 24).map(h => (100L + h, h * H + 9L, 2L))
    val events = (burst ++ clock).toDF("event_id", "t_us", "user_id")
    val got = EventOps.circadianProfile(events)
      .select("user_id", "n_events", "n_active_hours", "peak_hour_events", "chi2_num", "nonuniform")
      .as[(Long, Long, Long, Long, BigDecimal, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // 24·Σc² − n² = 24·100 − 100 = 2300; 100·2300 > 4973·10
    assert(got(1L) == ((10L, 1L, 10L, BigDecimal(2300), true)))
    // perfectly uniform: 24·24 − 576 = 0
    assert(got(2L) == ((24L, 24L, 1L, BigDecimal(0), false)))
  }

  test("propsSummary: schema-driven JSON extraction with malformed rows null-tolerated") {
    val events = Seq(
      (0L, "click", """{"k": 5}"""), (1L, "click", """{"k": 7}"""),
      (2L, "click", """{"k": 5}"""), (3L, "view", """not json at all"""),
      (4L, "view", """{"k": 9}""")).toDF("event_id", "event_type", "props")
    val got = EventOps.propsSummary(events)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("click") == ((3L, 17L, 5L, 7L, 2L)))
    // malformed row: counted in n_events, null k ignored by the aggs
    assert(got("view") == ((2L, 9L, 9L, 9L, 1L)))
  }

  test("templateAffix: shared header/footer found; diverse source scores zero") {
    val docs = Seq(
      (0L, "NAV HOME | body one here FOOTER(c)", "tpl"),
      (1L, "NAV HOME | body two words FOOTER(c)", "tpl"),
      (2L, "NAV HOME | something else x FOOTER(c)", "tpl"),
      (3L, "alpha content", "free"), (4L, "zeta differs", "free"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.templateAffix(docs, cap = 120)
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("tpl")._2 == "NAV HOME | ".length.toLong)
    assert(got("tpl")._4 == "NAV HOME | ")
    assert(got("tpl")._3 == " FOOTER(c)".length.toLong)
    assert(got("free")._2 == 0L && got("free")._3 == 0L && got("free")._4 == "")
  }

  test("licenseTag: first matching marker wins by priority") {
    val docs = Seq(
      (0L, "released under Creative Commons terms and All Rights Reserved"),
      (1L, "see the MIT License file"),
      (2L, "plain page")).toDF("doc_id", "text")
    val got = TextAnalysis.licenseTag(docs).select("doc_id", "license")
      .as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "cc", 1L -> "mit", 2L -> "none"))
  }

  test("decayed counts: exact power-of-two weights with the documented 40-half-life floor") {
    val day = 24L * H
    val ref = 100L * day
    val events = Seq(
      (0L, ref, "a"),           // age 0      → 2^40
      (1L, ref - day, "a"),     // age 1 hl   → 2^39
      (2L, ref - 2 * day, "b"), // age 2 hl   → 2^38
      (3L, ref - 41 * day, "b") // past floor → 0
    ).toDF("event_id", "t_us", "event_type")
    val got = EventOps.decayedCounts(events, halfLifeHours = 24L)
      .as[(String, Long, BigDecimal)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((2L, BigDecimal((1L << 40) + (1L << 39)))))
    assert(got("b") == ((2L, BigDecimal(1L << 38))))
  }

  test("sessionPaths: ordered multi-step journeys with multiplicity; gaps split paths") {
    val events = Seq(
      // user 1, session A: signup -> view -> purchase
      (0L, 0L, 1L, "signup"), (1L, 60L * 1000000L, 1L, "view"), (2L, 120L * 1000000L, 1L, "purchase"),
      // >30-minute gap after the purchase -> session B: view x4 (two overlapping view-view-view grams)
      (3L, 2000000000L, 1L, "view"), (4L, 2001000000L, 1L, "view"),
      (5L, 2002000000L, 1L, "view"), (6L, 2003000000L, 1L, "view"),
      // user 2: one session, view x3
      (7L, 0L, 2L, "view"), (8L, 1000000L, 2L, "view"), (9L, 2000000L, 2L, "view")
    ).toDF("event_id", "t_us", "user_id", "event_type")
    val got = EventOps.sessionPaths(events, gapMinutes = 30.0, n = 3, topK = 5, tsCol = "t_us")
      .as[(String, Long)].collect().toSeq
    assert(got.head == (("view view view", 3L)), "overlapping grams count with multiplicity")
    assert(got.contains(("signup view purchase", 1L)))
    // session B's grams never bridge the 31-minute gap into session A
    assert(!got.exists(_._1 == "purchase view view"))
    val plan = EventOps.sessionPaths(events, topK = 5, tsCol = "t_us")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"top-K must plan as TakeOrdered:\n$plan")
  }

  test("sessionLift: set semantics per session, exact marginals, absent pairs omitted") {
    val events = Seq(
      (0L, 0L, 1L, "A"), (1L, 10L, 1L, "B"),                      // session {A,B}
      (2L, 0L, 2L, "A"), (3L, 10L, 2L, "B"), (4L, 20L, 2L, "B"),  // {A,B} — dup B collapses
      (5L, 0L, 3L, "A"),                                          // {A}
      (6L, 0L, 4L, "B"), (7L, 10L, 4L, "C")                       // {B,C}
    ).toDF("event_id", "t_us", "user_id", "event_type")
    val got = EventOps.sessionLift(events, tsCol = "t_us")
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got(("A", "B")) == ((2L, 3L, 3L, 4L, 8.0 / 9.0)))
    assert(got(("B", "C")) == ((1L, 3L, 1L, 4L, 4.0 / 3.0)))
    assert(!got.contains(("A", "C")), "never-co-occurring pair emits no row")
    assert(got.size == 2)
  }

  test("survivalTable: censored users stay in the at-risk denominator") {
    val S = 1000000L // one second in micros
    val events = Seq(
      // u1: signup at 0, purchase at 1 s -> observed, bucket 0 (sec 1)
      (0L, 0L, 1L, "signup"), (1L, 1L * S, 1L, "purchase"),
      // u2: signup at 0, purchase at 5 s -> observed, bucket 2 (sec 5)
      (2L, 0L, 2L, "signup"), (3L, 5L * S, 2L, "purchase"),
      // u3: signup at 0, never converts -> censored at stream end 16 s, bucket 4
      (4L, 0L, 3L, "signup"),
      // u4: purchase BEFORE its signup only -> not a conversion, censored
      (5L, 2L * S, 4L, "purchase"), (6L, 3L * S, 4L, "signup"),
      // stream end marker
      (7L, 16L * S, 9L, "click")
    ).toDF("event_id", "t_us", "user_id", "event_type")
    val got = EventOps.survivalTable(events)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // u4 censored at (16-3)=13 s -> bucket 3; u3 censored at 16 s -> bucket 4
    assert(got(0L) == ((1L, 4L, 1L, 0L)), "bucket 0: u1 converts, all 4 at risk")
    assert(got(2L) == ((4L, 3L, 1L, 0L)), "bucket 2: u2 converts, u2/u3/u4 at risk")
    assert(got(3L) == ((8L, 2L, 0L, 1L)), "bucket 3: u4 censored")
    assert(got(4L) == ((16L, 1L, 0L, 1L)), "bucket 4: u3 censored last")
    assert(got.size == 4)
  }

  test("latestSnapshot: newest row per key wins; timestamp ties break to the larger id") {
    val events = Seq(
      (10L, 100L, 1L, "view"),  // older
      (11L, 200L, 1L, "view"),  // newest for (1, view)
      (12L, 200L, 2L, "view"),  // tie on ts with 13 ...
      (13L, 200L, 2L, "view"),  // ... larger id wins
      (14L, 50L, 1L, "buy")     // singleton group
    ).toDF("event_id", "t_us", "user_id", "event_type")
    val got = EventOps.latestSnapshot(events, Seq("user_id", "event_type"))
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, "view")) == ((200L, 11L, 2L)))
    assert(got((2L, "view")) == ((200L, 13L, 2L)))
    assert(got((1L, "buy")) == ((50L, 14L, 1L)))
  }

  test("latestSnapshot plans as a partial-combining aggregate — never a per-key sort window") {
    val events = Seq((10L, 100L, 1L, "view")).toDF("event_id", "t_us", "user_id", "event_type")
    val plan = EventOps.latestSnapshot(events, Seq("user_id", "event_type"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window/sort formulation:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("partial_"),
      s"struct max must map-side combine:\n$plan")
  }
}
