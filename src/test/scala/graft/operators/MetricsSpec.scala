package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private def mkSp(rows: (Long, Long, String, String, Double, Double)*) =
    rows.toSeq.toDF("id", "user_id", "s", "f", "lon", "lat")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("lon"), col("lat"))

  test("tracking quality 'all' = tracked seconds over extent") {
    val sp = mkSp(
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 09:00:00", 8.5, 47.3),
      (1L, 1L, "2023-01-01 10:00:00", "2023-01-01 11:00:00", 8.5, 47.3))
    val q = Metrics.temporalTrackingQuality(sp, "all").as[(Long, Double)].collect().toMap
    assert(math.abs(q(1L) - 7200.0 / 10800.0) < 1e-12)
  }

  test("day granularity splits records at midnight") {
    val sp = mkSp((0L, 1L, "2023-01-01 23:00:00", "2023-01-02 01:00:00", 8.5, 47.3))
    val q = Metrics.temporalTrackingQuality(sp, "day")
      .select(col("user_id"), col("day").cast("string"), col("quality")).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(math.abs(q("2023-01-01 00:00:00") - 3600.0 / 86400.0) < 1e-12)
    assert(math.abs(q("2023-01-02 00:00:00") - 3600.0 / 86400.0) < 1e-12)
  }

  test("splitAt handles exact-border and sub-bucket records") {
    val sp = mkSp(
      (0L, 1L, "2023-01-01 00:00:00", "2023-01-02 00:00:00", 8.5, 47.3), // exactly one day
      (1L, 1L, "2023-01-01 03:00:00", "2023-01-01 04:00:00", 8.5, 47.3)) // inside one day
    val out = Metrics.splitAt(sp, "day").orderBy("id", "started_at").collect()
    assert(out.length == 2)
    assert(out(0).getAs[java.sql.Timestamp]("finished_at") == ts("2023-01-02 00:00:00"))
  }

  test("non-positive duration records are filtered from every granularity " +
    "(ref test_tracking_quality.py:253-269, 225-233)") {
    // reference fixture: zero-duration, negative-duration, and 1h records
    // all starting at midnight; only the positive one counts
    val sp = mkSp(
      (0L, 0L, "1971-01-01 00:00:00", "1971-01-01 00:00:00", 8.5067847, 47.4),
      (1L, 0L, "1971-01-01 00:00:00", "1970-12-31 23:00:00", 8.5067847, 47.4),
      (2L, 0L, "1971-01-01 00:00:00", "1971-01-01 01:00:00", 8.5067847, 47.4))
    def q(g: String): Double =
      Metrics.temporalTrackingQuality(sp, g).select(col("quality")).as[Double].collect().last
    assert(math.abs(q("all") - 1.0) < 1e-12)
    assert(math.abs(q("day") - 1.0 / 24) < 1e-12)
    assert(math.abs(q("week") - 1.0 / 24 / 7) < 1e-12)
    assert(math.abs(q("weekday") - 1.0 / 24) < 1e-12)
    assert(math.abs(q("hour") - 1.0) < 1e-12)
  }

  test("exact boundary split: zero-length-at-border and 1-unit-around-border records " +
    "(ref test_exact_midnight_split, at engine resolution = 1 microsecond)") {
    val mn = "2022-03-18 00:00:00"
    val us = 1.0 / 1e6
    val sp = Seq(
      (0L, 0L, -us, us),  // straddles midnight by 1 us each side
      (1L, 1L, -us, 0.0), // ends exactly at midnight
      (2L, 2L, 0.0, us),  // starts exactly at midnight
      (3L, 3L, 0.0, 0.0)) // zero-length at midnight
      .toDF("id", "user_id", "ds", "df")
      .select(col("id"), col("user_id"),
        timestamp_micros((unix_micros(to_timestamp(lit(mn))) + (col("ds") * 1e6).cast("long"))).as("started_at"),
        timestamp_micros((unix_micros(to_timestamp(lit(mn))) + (col("df") * 1e6).cast("long"))).as("finished_at"))
    val out = Metrics.splitAt(sp, "hour")
      .orderBy("user_id", "started_at")
      .select(col("user_id"), col("started_at").cast("string"), col("finished_at").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // same shape as the reference: user 0 splits into two slices at the
    // border; 1, 2 and the zero-length 3 stay whole
    assert(out.toSeq === Seq(
      (0L, "2022-03-17 23:59:59.999999", "2022-03-18 00:00:00"),
      (0L, "2022-03-18 00:00:00", "2022-03-18 00:00:00.000001"),
      (1L, "2022-03-17 23:59:59.999999", "2022-03-18 00:00:00"),
      (2L, "2022-03-18 00:00:00", "2022-03-18 00:00:00.000001"),
      (3L, "2022-03-18 00:00:00", "2022-03-18 00:00:00")))
  }

  test("absolute extent: a record ending exactly at midnight yields no empty trailing day " +
    "(ref test_absolute_extent)") {
    // midnight start + 10 days -> last day bucket is day 9 (Jan 10);
    // midday start + 10 days -> the half-day tail lands on day 10 (Jan 11)
    val spMidnight = mkSp((0L, 0L, "1971-01-01 00:00:00", "1971-01-11 00:00:00", 8.5, 47.4))
    val lastMidnight = Metrics.temporalTrackingQuality(spMidnight, "day")
      .agg(max(col("day")).cast("string")).as[String].collect().head
    assert(lastMidnight === "1971-01-10 00:00:00")
    val spMidday = mkSp((0L, 0L, "1971-01-01 12:00:00", "1971-01-11 12:00:00", 8.5, 47.4))
    val lastMidday = Metrics.temporalTrackingQuality(spMidday, "day")
      .agg(max(col("day")).cast("string")).as[String].collect().head
    assert(lastMidday === "1971-01-11 00:00:00")
  }

  test("radius of gyration count vs duration weighting") {
    // two points 2km apart; duration weights pull the center to the long stay
    val sp = mkSp(
      (0L, 1L, "2023-01-01 00:00:00", "2023-01-01 10:00:00", 8.50, 47.30),
      (1L, 1L, "2023-01-01 11:00:00", "2023-01-01 12:00:00", 8.50, 47.318)) // ~2km north
    val rgCount = Metrics.radiusGyration(sp, "count").select("radius_gyration").as[Double].first()
    val rgDur = Metrics.radiusGyration(sp, "duration").select("radius_gyration").as[Double].first()
    assert(rgCount > 900 && rgCount < 1100) // half the separation
    assert(rgDur < rgCount) // weighted center sits near the long stay
  }

  test("jump length is distance to next staypoint, null on last") {
    val sp = mkSp(
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 09:00:00", 8.50, 47.300),
      (1L, 1L, "2023-01-01 10:00:00", "2023-01-01 11:00:00", 8.50, 47.309))
    val rows = Metrics.jumpLength(sp).orderBy("id").select("jump_length").collect()
    assert(math.abs(rows(0).getDouble(0) - 1001) < 10) // ~0.009° lat ≈ 1km
    assert(rows(1).isNullAt(0))
  }

  test("modal split pivots modes; norm rows sum to 1") {
    val tpls = Seq(
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 08:30:00", "walk"),
      (1L, 1L, "2023-01-01 09:00:00", "2023-01-01 09:30:00", "car"),
      (2L, 1L, "2023-01-01 10:00:00", "2023-01-01 10:30:00", "car")
    ).toDF("id", "user_id", "s", "f", "mode")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("mode"),
        expr("array(struct(8.5d as lon, 47.3d as lat), struct(8.51d as lon, 47.3d as lat))").as("points"))
    val ms = Metrics.calculateModalSplit(tpls, "count", perUser = true, norm = true).collect()
    assert(ms.length == 1)
    val r = ms(0)
    assert(math.abs(r.getAs[Double]("car") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("walk") - 1.0 / 3.0) < 1e-12)
  }

  test("transport mode buckets by speed (closed-left intervals)") {
    // 1 km in 10 min = 1.67 m/s slow; 10km in 10min = 16.7 m/s motorized
    val tpls = Seq(
      (0L, 1L, "2023-01-01 08:00:00", "2023-01-01 08:10:00", Seq((8.5, 47.3), (8.5, 47.309))),
      (1L, 1L, "2023-01-01 09:00:00", "2023-01-01 09:10:00", Seq((8.5, 47.3), (8.5, 47.39)))
    ).toDF("id", "user_id", "s", "f", "raw")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"),
        expr("transform(raw, p -> struct(p._1 as lon, p._2 as lat))").as("points"))
    val modes = Labelling.predictTransportMode(tpls).select("id", "mode").as[(Long, String)].collect().toMap
    assert(modes(0L) == "slow_mobility")
    assert(modes(1L) == "motorized_mobility")
  }

  test("speed of positionfixes imputes the first fix from the second") {
    val pfs = Seq(
      (0L, 1L, "2023-01-01 08:00:00", 8.50, 47.300),
      (1L, 1L, "2023-01-01 08:10:00", 8.50, 47.309), // ~1km in 600s
      (2L, 1L, "2023-01-01 08:20:00", 8.50, 47.318)
    ).toDF("id", "user_id", "t", "lon", "lat")
      .select(col("id"), col("user_id"), to_timestamp(col("t")).as("tracked_at"), col("lon"), col("lat"))
    val sp = Labelling.getSpeedPositionfixes(pfs).orderBy("id").select("speed").as[Double].collect()
    assert(math.abs(sp(0) - sp(1)) < 1e-12) // imputed
    assert(sp(1) > 1.6 && sp(1) < 1.8)
  }

  test("location labelling FREQ: top duration locations get home/work") {
    val sp = Seq(
      (0L, 1L, "2023-01-01 00:00:00", "2023-01-01 10:00:00", 100L),
      (1L, 1L, "2023-01-01 11:00:00", "2023-01-01 16:00:00", 200L),
      (2L, 1L, "2023-01-01 17:00:00", "2023-01-01 18:00:00", 300L),
      (3L, 1L, "2023-01-02 00:00:00", "2023-01-02 08:00:00", 100L)
    ).toDF("id", "user_id", "s", "f", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("location_id"))
    val out = LocationLabelling.freqMethod(sp).select("id", "purpose").as[(Long, Option[String])].collect().toMap
    assert(out(0L).contains("home") && out(3L).contains("home"))
    assert(out(1L).contains("work"))
    assert(out(2L).isEmpty)
  }

  test("pre-filter keeps only users/locations above thresholds") {
    val rows = (0 until 12).map { i =>
      (i.toLong, 1L, f"2023-01-${1 + i}%02d ${i % 24}%02d:00:00", 100L + (i % 2))
    }
    val sp = rows.toDF("id", "user_id", "s", "loc")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        (to_timestamp(col("s")) + expr("INTERVAL 2 HOURS")).as("finished_at"),
        col("loc").as("location_id"))
    // thresholds high -> nothing kept
    val strict = LocationLabelling.preFilterLocations(sp)
    assert(strict.filter(col("keep")).count() == 0)
    // relaxed -> everything kept
    val loose = LocationLabelling.preFilterLocations(sp, threshSp = 2, threshLoc = 2,
      threshSpAtLoc = 2, threshLocTimeHours = 1, threshLocPeriodHours = 2)
    assert(loose.filter(col("keep")).count() == 12)
  }

  test("spatial filter: bbox prefilter + exact polygon") {
    val pts = Seq((0L, 8.52, 47.32), (1L, 8.75, 47.35), (2L, 8.55, 47.55))
      .toDF("id", "lon", "lat")
    val triangle = Seq(Seq((8.5, 47.3), (8.6, 47.3), (8.5, 47.4)))
    val kept = SpatialOps.spatialFilterPoints(pts, triangle).select("id").as[Long].collect()
    assert(kept.toSeq == Seq(0L))
  }

  test("distance matrix long form upper triangle") {
    val pts = Seq((0L, 8.5, 47.3), (1L, 8.6, 47.3), (2L, 8.7, 47.3)).toDF("id", "lon", "lat")
    val dm = SpatialOps.distanceMatrixPoints(pts).collect()
    assert(dm.length == 3) // 3 choose 2
    assert(dm.forall(r => r.getAs[Long]("id_1") < r.getAs[Long]("id_2")))
  }

  test("linestring filter pins the documented boundary-touch convention") {
    // The engine deviates from shapely DE-9IM for degenerate contact (by
    // documented convention): a line touching the ring from inside counts
    // as boundary intersection, so it is NOT 'within' and IS 'crosses'.
    // This fixture freezes that choice — if the kernel changes, this fails.
    val square = Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)))
    val lines = Seq(
      (0L, Seq((0.5, 0.5), (1.0, 0.5))),  // endpoint ON the x=1 edge
      (1L, Seq((0.2, 0.2), (0.8, 0.8))))  // strictly interior
      .map { case (id, pts) => (id, pts.map { case (x, y) => (x, y) }) }
      .toDF("id", "raw")
      .select(col("id"),
        expr("transform(raw, p -> struct(p._1 as lon, p._2 as lat))").as("points"))
    def ids(method: String): Set[Long] =
      SpatialOps.spatialFilterLinestrings(lines, square, method)
        .select("id").as[Long].collect().toSet
    assert(ids("within") == Set(1L))        // touch rejected from 'within'
    assert(ids("crosses") == Set(0L))       // touch counted as a crossing
    assert(ids("intersects") == Set(0L, 1L))
  }

  test("distance matrix X×Y dense form; euclidean under a projected CRS") {
    val x = Seq((0L, 8.5, 47.3), (1L, 8.6, 47.3)).toDF("id", "lon", "lat")
    val y = Seq((10L, 8.5, 47.4), (11L, 8.6, 47.4), (12L, 8.7, 47.4)).toDF("id", "lon", "lat")
    val dm = SpatialOps.distanceMatrixPoints(x, Some(y), symmetric = false).collect()
    assert(dm.length == 6) // dense |X|×|Y|, no triangle, no self-pair exclusion
    assert(dm.forall(_.getAs[Double]("distance_m") > 0))
    // projected CRS on both frames → plain euclidean in CRS units
    val xp = graft.functions.GeoFunctions.withCrs(
      Seq((0L, 0.0, 0.0)).toDF("id", "lon", "lat"), "EPSG:2056")
    val yp = graft.functions.GeoFunctions.withCrs(
      Seq((1L, 3.0, 4.0)).toDF("id", "lon", "lat"), "EPSG:2056")
    val d = SpatialOps.distanceMatrixPoints(xp, Some(yp), symmetric = false)
      .collect()(0).getAs[Double]("distance_m")
    assert(d == 5.0)
    // mismatched CRSs must fail loudly (reference asserts X.crs == Y.crs,
    // distances.py:118) instead of mixing meters with degrees
    val ymismatch = Seq((1L, 3.0, 4.0)).toDF("id", "lon", "lat")
    intercept[IllegalArgumentException] {
      SpatialOps.distanceMatrixPoints(xp, Some(ymismatch), symmetric = false)
    }
  }

  test("od flows: consecutive location visits count directed transitions; noise skipped") {
    val spLoc = Seq(
      // user 1: A -> A -> (noise) -> B -> A
      (10L, 1L, "2023-01-01 08:00:00", java.lang.Long.valueOf(100L)),
      (11L, 1L, "2023-01-01 09:00:00", java.lang.Long.valueOf(100L)),
      (12L, 1L, "2023-01-01 10:00:00", null.asInstanceOf[java.lang.Long]),
      (13L, 1L, "2023-01-01 11:00:00", java.lang.Long.valueOf(200L)),
      (14L, 1L, "2023-01-01 12:00:00", java.lang.Long.valueOf(100L)),
      // user 2: C -> D (distinct locations, distinct keys)
      (20L, 2L, "2023-01-01 08:00:00", java.lang.Long.valueOf(300L)),
      (21L, 2L, "2023-01-01 09:00:00", java.lang.Long.valueOf(400L)))
      .toDF("id", "user_id", "s", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"), col("location_id"))
    val flows = Metrics.odFlows(spLoc)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // keys are the smallest member staypoint id per (user, location)
    assert(flows === Map(
      (10L, 10L) -> 1L, // A -> A self re-visit
      (10L, 13L) -> 1L, // A -> B (noise staypoint skipped, not a barrier)
      (13L, 10L) -> 1L, // B -> A
      (20L, 21L) -> 1L))
  }

  test("return times: revisit gaps per (user, location) with neutral keys; noise excluded") {
    val spLoc = Seq(
      // user 1 at location 100: visits 08-09, 11-12, next day 08:30-09
      (10L, 1L, "2023-01-01 08:00:00", "2023-01-01 09:00:00", java.lang.Long.valueOf(100L)),
      (13L, 1L, "2023-01-01 11:00:00", "2023-01-01 12:00:00", java.lang.Long.valueOf(100L)),
      (15L, 1L, "2023-01-02 08:30:00", "2023-01-02 09:00:00", java.lang.Long.valueOf(100L)),
      // single visit to 200 and a noise staypoint: no returns
      (14L, 1L, "2023-01-01 13:00:00", "2023-01-01 14:00:00", java.lang.Long.valueOf(200L)),
      (16L, 1L, "2023-01-02 10:00:00", "2023-01-02 11:00:00", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "user_id", "s", "f", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("location_id"))
    val out = Metrics.returnTimes(spLoc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // location key is the smallest member staypoint id (10); gaps:
    // 09:00 -> 11:00 = 2 h, 12:00 -> next-day 08:30 = 20.5 h
    assert(out.toSet === Set(
      (1L, 10L, 1L, 2L * 3600L * 1000000L),
      (1L, 10L, 2L, (20L * 3600L + 1800L) * 1000000L)))
  }

  test("regularityCurve: pooled top-location share per hour-of-week; relabeling-invariant") {
    // 2023-01-02 is a Monday -> weekday 0 under the epoch-day+3 rule
    val spLoc = Seq(
      // user 1, Monday 09h: loc 100 x3, loc 200 x1 -> top 3 of 4
      (10L, 1L, "2023-01-02 09:00:00", java.lang.Long.valueOf(100L)),
      (11L, 1L, "2023-01-02 09:10:00", java.lang.Long.valueOf(100L)),
      (12L, 1L, "2023-01-02 09:20:00", java.lang.Long.valueOf(100L)),
      (13L, 1L, "2023-01-02 09:30:00", java.lang.Long.valueOf(200L)),
      // user 2, Monday 09h: one visit -> top 1 of 1
      (20L, 2L, "2023-01-02 09:45:00", java.lang.Long.valueOf(300L)),
      // user 1, Tuesday 10h: counts tie at 1 -> top 1 of 2
      (14L, 1L, "2023-01-03 10:00:00", java.lang.Long.valueOf(100L)),
      (15L, 1L, "2023-01-03 10:30:00", java.lang.Long.valueOf(200L)),
      // noise staypoint: excluded
      (16L, 1L, "2023-01-03 10:40:00", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "user_id", "s", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        col("location_id"))
    def curve(df: org.apache.spark.sql.DataFrame) =
      Metrics.regularityCurve(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toMap
    val got = curve(spLoc)
    assert(got === Map(
      (0L, 9L) -> ((4L, 5L, 0.8)),    // (3 of 4) + (1 of 1) pooled
      (1L, 10L) -> ((1L, 2L, 0.5))))
    // only the top COUNT matters, so any label bijection gives the same curve
    assert(curve(spLoc.withColumn("location_id", col("location_id") * 13 + 7)
      .repartition(5)) === got)
  }

  test("lzComplexity: hand-parsed phrase counts; relabeling and partitioning invariance") {
    // sequence A A B A B A B parses as [A][AB][ABAB] -> 3 phrases:
    //   p0: nothing before -> [A]
    //   p1: 'A' matches, 'AB' doesn't -> [AB]
    //   p3: 'ABA B' matches starting at index 1 (overlap allowed) -> rest
    def sp(u: Long, locs: Seq[Long]) = locs.zipWithIndex.map { case (l, i) =>
      (u * 1000L + i, u, s"2023-01-01 0${i + 1}:00:00", java.lang.Long.valueOf(l))
    }
    val spLoc = (sp(1L, Seq(100L, 100L, 200L, 100L, 200L, 100L, 200L)) ++
      sp(2L, Seq(300L)) ++                       // single visit: 1 phrase
      sp(3L, Seq(1L, 2L, 3L, 4L)))               // all distinct: 4 phrases
      .toDF("id", "user_id", "s", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        col("location_id"))
    val out = Metrics.lzComplexity(spLoc)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(1L -> ((7L, 3L)), 2L -> ((1L, 1L)), 3L -> ((4L, 4L))))
    // phrase structure only depends on the repetition pattern, not labels
    val relabeled = spLoc.withColumn("location_id", col("location_id") * 7 + 1)
    val out2 = Metrics.lzComplexity(relabeled.repartition(5))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out2 === out)
  }

  test("predictability: hand-computed lambda sums, limits, and the Fano equation") {
    def sp(u: Long, locs: Seq[Long]) = locs.zipWithIndex.map { case (l, i) =>
      (u * 1000L + i, u, s"2023-01-01 0${i + 1}:00:00", java.lang.Long.valueOf(l))
    }
    // user 1: A A B — lambdas [1, 2, 1] = 4; S = 3*log2(3)/4 ≈ 1.1887
    //   >= log2(N=2) = 1 -> fully unpredictable floor: pi = 1/N = 0.5
    // user 2: A A A A — lambdas [1, 3, 2, 1] = 7; N=1 -> pi = 1
    // user 3: A B A B A B A B (n=8) — lambdas [1,1,6,5,4,3,2,1] = 23,
    //   S = 8*3/23 ≈ 1.043 < log2(2)?? no: log2(2)=1, S>1 -> pi=0.5
    val spLoc = (sp(1L, Seq(9L, 9L, 5L)) ++
      sp(2L, Seq(3L, 3L, 3L, 3L)) ++
      sp(3L, Seq(1L, 2L, 1L, 2L, 1L, 2L, 1L, 2L)))
      .toDF("id", "user_id", "s", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        col("location_id"))
    val out = Metrics.predictability(spLoc).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L)._1 == 3L && out(1L)._2 == 2L && out(1L)._3 == 4L)
    assert(out(1L)._4 == math.floor(3.0 * (math.log(3.0) / math.log(2.0)) / 4.0 * 1e6).toLong)
    assert(out(1L)._5 == 500000L) // S >= log2(N): floor at 1/N
    assert(out(2L) == ((4L, 1L, 7L, out(2L)._4, 1000000L))) // N=1: pi = 1
    assert(out(3L)._3 == 23L && out(3L)._5 == 500000L)
  }

  test("predictability: Fano equation holds at the returned pi for interior solutions") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    // long repetitive tour over 4 locations: S lands strictly between 0
    // and log2(4), so pi is an interior bisection solution
    val pattern = Seq(1L, 2L, 3L, 4L) ++ Seq(1L, 2L, 3L, 4L) ++ Seq(1L, 2L, 1L, 2L) ++
      Seq(1L, 2L, 3L, 4L) ++ Seq(4L, 3L, 2L, 1L)
    val rows = pattern.zipWithIndex.map { case (l, i) =>
      (i.toLong, 1L, f"2023-01-01 ${i % 24}%02d:${i / 24}%02d:00", l)
    }
    val spLoc = rows.toDF("id", "user_id", "s", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        col("location_id"))
    val r = Metrics.predictability(spLoc).collect().head
    val (n, nLoc, s, pi) = (r.getLong(1), r.getLong(2), r.getLong(4) / 1e6, r.getLong(5) / 1e6)
    assert(n == 20L && nLoc == 4L)
    assert(s > 0.0 && s < log2(nLoc.toDouble), s"expected interior S, got $s")
    assert(pi > 1.0 / nLoc && pi < 1.0)
    val fano = -pi * log2(pi) - (1 - pi) * log2(1 - pi) + (1 - pi) * log2((nLoc - 1).toDouble)
    assert(math.abs(fano - s) < 1e-4, s"Fano residual: H(pi)+... = $fano vs S = $s")
    // relabeling + partitioning invariance, as for lzComplexity
    val relabeled = spLoc.withColumn("location_id", col("location_id") * 13 + 5)
    val r2 = Metrics.predictability(relabeled.repartition(7)).collect().head
    assert(r2.getLong(3) == r.getLong(3) && r2.getLong(5) == r.getLong(5))
  }

  test("spatial filter on locations via center points: within == intersects, crosses empty " +
    "(ref geogr/test_filter.py:77-97)") {
    // locations filter through the same point path as staypoints, on the
    // center geometry; the reference asserts within == intersects for
    // points and that no point can cross an area
    val locs = Seq(
      (0L, 1L, 0.5, 0.5),  // inside the unit square
      (1L, 1L, 2.0, 2.0),  // outside
      (2L, 2L, 0.0, 0.5))  // exactly on the boundary
      .toDF("id", "user_id", "center_lon", "center_lat")
    val square = Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)))
    def ids(method: String): Set[Long] =
      SpatialOps.spatialFilterPoints(locs, square,
        lonCol = "center_lon", latCol = "center_lat", method = method)
        .select("id").as[Long].collect().toSet
    assert(ids("within") === ids("intersects"))
    assert(ids("crosses") === Set.empty)
    assert(ids("within").contains(0L) && !ids("within").contains(1L))
  }

  test("location entropy: uniform visits hit log2(k), single location gives zero") {
    def spLoc(rows: (Long, Long, Long)*): org.apache.spark.sql.DataFrame =
      rows.toSeq.toDF("id", "user_id", "location_id")
    // user 1: 4 uniform locations -> shannon = random = 2 bits
    // user 2: one location -> both zero
    // user 3: (3, 1) split over two locations
    val df = spLoc(
      (Seq.tabulate(4)(i => (i.toLong, 1L, i.toLong * 10)) ++
        Seq((10L, 2L, 5L)) ++
        Seq((20L, 3L, 7L), (21L, 3L, 7L), (22L, 3L, 7L), (23L, 3L, 8L))): _*)
    val e = Metrics.locationEntropy(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(e(1L)._1 === 4L && e(1L)._2 === 4L)
    assert(math.abs(e(1L)._3 - 2.0) < 1e-12 && math.abs(e(1L)._4 - 2.0) < 1e-12)
    assert(e(2L)._3 === 0.0 && e(2L)._4 === 0.0)
    // user 3: H(3/4, 1/4) = 2 - 0.75*log2(3) ≈ 0.8112781
    val h = 2.0 - 0.75 * math.log(3.0) / math.log(2.0)
    assert(math.abs(e(3L)._4 - h) < 1e-12)
    assert(e(3L)._4 < e(3L)._3, "skewed visits must fall below random entropy")
  }

  test("location diversity: exact Simpson numerator over visit counts") {
    val df = Seq(
      (0L, 1L, 10L), (1L, 1L, 10L), (2L, 1L, 10L), (3L, 1L, 20L), // user 1: (3,1)
      (4L, 2L, 30L))                                              // user 2: single visit
      .toDF("id", "user_id", "location_id")
    val d = Metrics.locationDiversity(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(d(1L) === ((4L, 2L, 3L, 6L))) // sum c(c-1) = 3*2 + 1*0 = 6
    assert(d(2L) === ((1L, 1L, 1L, 0L))) // one visit: zero pair concentration
  }

  test("place segregation: single-group cell reads 1, even mix 0, absent groups exact") {
    // cell A (-122.4): users 0,4,8 — all group 0 => S = 1
    // cell B (-122.3): users 0,1,2,3 once each — even mix => S = 0
    // cell C (-122.2): groups 0,0,1 => seg_num = |8-3| + |4-3| + 2*3 = 12, S = 12/18
    def pt(u: Long, lon: Double) = (u, lon, 47.6)
    val pts = Seq(pt(0, -122.4), pt(4, -122.4), pt(8, -122.4),
      pt(0, -122.3), pt(1, -122.3), pt(2, -122.3), pt(3, -122.3),
      pt(0, -122.2), pt(4, -122.2), pt(1, -122.2))
      .toDF("user_id", "lon", "lat")
    val got = SpatialOps.placeSegregation(pts, nGroups = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(-12240L) === ((3L, 18L, 1.0)))         // 3 visits, |12-3|+3*3 = 18, S=18/18
    assert(got(-12230L) === ((4L, 0L, 0.0)))
    assert(got(-12220L) === ((3L, 12L, 12.0 / 18.0)))
  }

  test("k-anonymous cells: rare cells suppressed at summary and row level; exact edges") {
    val pts = (
      (1 to 6).map(u => (u.toLong * 100, u.toLong, 8.5012, 47.30)) ++      // popular cell: 6 users
      Seq((900L, 1L, 8.5212, 47.30), (901L, 2L, 8.5212, 47.30)) ++         // rare cell: 2 users
      Seq((950L, 7L, 8.51, 47.30)))                                        // edge: lon exactly on boundary
      .toDF("id", "user_id", "lon", "lat")
    val cells = SpatialOps.kAnonymousCells(pts, cellMicroDeg = 10000L, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // 8.5012 -> cell 850; 8.51 -> exactly 851 (boundary belongs to the
    // upper cell under floor); 8.5212 -> 852 suppressed
    assert(cells.keySet === Set((850L, 4730L)))
    assert(cells((850L, 4730L)) === ((6L, 6L)))
    val kept = SpatialOps.suppressRareCells(pts, cellMicroDeg = 10000L, k = 5)
      .select("id").as[Long].collect().toSet
    assert(kept === (1 to 6).map(_.toLong * 100).toSet)
  }

  test("radiation model: three cells in a line give the hand-computed flows") {
    import spark.implicits._
    // cells A(cx 0, m 2), B(cx 1, m 3), C(cx 3, m 5), all on one row of
    // latitude — hand-derived with s_ij = population strictly closer:
    // T_AB = 4·3/(2·5), T_AC = 4·5/((2+3)(2+5+3)), T_BA = 9·2/(3·5),
    // T_BC = 9·5/((3+2)(3+5+2)), T_CB = 25·3/(5·8), T_CA = 25·2/((5+3)(5+2+3))
    val pts = (Seq.fill(2)(0.005) ++ Seq.fill(3)(0.015) ++ Seq.fill(5)(0.035))
      .zipWithIndex.map { case (lon, i) => (i.toLong, lon, 0.005) }
      .toDF("id", "lon", "lat")
    val got = SpatialOps.radiationFlows(pts, cellMicroDeg = 10000L, refLatDeg = 47.6)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    assert(got.keySet == Set((0L, 1L), (0L, 3L), (1L, 0L), (1L, 3L), (3L, 1L), (3L, 0L)))
    assert(got((0L, 1L)) == ((2L, 3L, 0L, 1.2)))
    assert(got((0L, 3L)) == ((2L, 5L, 3L, 0.4)))
    assert(got((1L, 0L)) == ((3L, 2L, 0L, 1.2)))
    assert(got((1L, 3L)) == ((3L, 5L, 2L, 0.9)))
    assert(got((3L, 1L)) == ((5L, 3L, 0L, 1.875)))
    assert(got((3L, 0L)) == ((5L, 2L, 3L, 0.625)))
  }

  test("ringed radiation flows equal the exact form intersected with the integer cap") {
    import spark.implicits._
    // a 2-D scatter of cells (some in the same ring, some at ring
    // boundaries: Δcy = 1 and 2 sit exactly at the width-1 ring edges)
    // — for several ring widths, the ringed twin must reproduce the
    // full-window flows on exactly the pairs inside its cap
    val pts = Seq(
      (0.005, 0.005, 2), (0.015, 0.005, 3), (0.035, 0.005, 5),
      (0.005, 0.015, 1), (0.025, 0.025, 4), (0.005, 0.045, 2),
      (0.045, 0.045, 1)).flatMap { case (lon, lat, n) =>
        Seq.fill(n)((lon, lat))
      }.zipWithIndex.map { case ((lon, lat), i) => (i.toLong, lon, lat) }
      .toDF("id", "lon", "lat")
    val cosLatQ = math.floor(math.cos(math.toRadians(47.6)) * 1e6 + 0.5).toLong
    val exact = SpatialOps.radiationFlows(pts, cellMicroDeg = 10000L, refLatDeg = 47.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    for ((w, mr) <- Seq((1L, 1), (1L, 2), (2L, 1), (3L, 0))) {
      val capU = BigInt((mr + 1L) * w * 1000000L)
      val expected = exact.filter { case ((ox, oy, dx, dy), _) =>
        val d2 = BigInt((dx - ox) * cosLatQ).pow(2) + BigInt((dy - oy) * 1000000L).pow(2)
        d2 < capU.pow(2)
      }
      val ringed = SpatialOps.radiationFlowsRinged(pts, cellMicroDeg = 10000L,
          refLatDeg = 47.6, ringWidthCells = w, maxRings = mr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
          ((r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
      assert(ringed == expected, s"ringWidthCells=$w maxRings=$mr")
    }
  }

  test("Song entropy card and Fano bound: hand-computed ladder on three sequences") {
    import spark.implicits._
    // user 1: AAAAA (pure dwell), user 2: ABAB (period 2, short),
    // user 4: (AB)^10 (period 2, long enough for the LZ76 estimator to
    // dip under ln 2 and make the temporal Fano bound non-vacuous)
    val rows =
      (0 until 5).map(k => (1L, k.toLong, 0L)) ++
      (0 until 4).map(k => (2L, k.toLong, (k % 2).toLong)) ++
      (0 until 20).map(k => (4L, k.toLong, (k % 2).toLong))
    val df = rows.toDF("user_id", "k", "location_id")
    val ent = Metrics.locationEntropyQ(df).collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
        r.getLong(6), r.getLong(7), r.getDouble(8)))).toMap
    // lnq floors: ln2→693147, ln4→1386294, ln5→1609437, ln10→2302585, ln20→2995732
    // user 1: S_unc = 0; LZ76("AAAAA") = A + AAAA(overlap) = 2 phrases
    assert(ent(1L) == ((5L, 1L, 0L, 0L, 0.0, 2L, 2L * 1609437L, 2 * 1609437 / 5e6)), ent(1L))
    // user 2: counts (2,2) → num = 4·lnq(4) − 4·lnq(2) = 2772588 → ln 2
    // nats; LZ76("ABAB") = A, B, AB = 3 phrases
    assert(ent(2L) == ((4L, 2L, 693147L, 2772588L, 2772588 / 4e6, 3L,
      3L * 1386294L, 3 * 1386294 / 4e6)), ent(2L))
    // user 4: counts (10,10) → num = 20·lnq(20) − 20·lnq(10) = 13862940
    // (ln 2 again); LZ76((AB)^10) = A, B, (AB)^9 via overlap = 3 phrases
    assert(ent(4L) == ((20L, 2L, 693147L, 13862940L, 13862940 / 20e6, 3L,
      3L * 2995732L, 3 * 2995732 / 20e6)), ent(4L))

    val pi = Metrics.predictabilityBound(df).collect().map(r => r.getLong(0) ->
      ((r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))).toMap
    // single location → perfectly predictable by definition
    assert(pi(1L) == ((1024L, 1.0, 1024L, 1.0)), pi(1L))
    // S_unc = ln 2 with N = 2: H(Π) = ln 2 exactly at Π = 1/2, and the
    // quantized grid admits j = 512 with n·F(512) = G·S_num EXACTLY
    // (F(512) = 1024·(lnq(1024) − lnq(512)) = 1024·693147) — j = 513
    // already fails. Both users sit at the same entropy, different n.
    assert(pi(2L)._1 == 512L && pi(2L)._2 == 0.5, pi(2L))
    assert(pi(4L)._1 == 512L && pi(4L)._2 == 0.5, pi(4L))
    // user 2's LZ76 estimate (3/4·ln 4 ≈ 1.04 nats) exceeds every F —
    // the bound is vacuous at grid resolution and reports 0, loudly
    assert(pi(2L)._3 == 0L, pi(2L))
    // user 4's temporal estimate 3·ln(20)/20 ≈ 0.449 nats < ln 2: the
    // bound is real; H(0.83) ≈ 0.456 ≥ 0.449 > H(0.84) ≈ 0.440 puts
    // Π_max between 849/1024 and 861/1024
    assert(pi(4L)._3 > 845L && pi(4L)._3 < 865L, pi(4L))
  }

  test("Markov rung: conditional entropy is 0 for deterministic chains, exact otherwise") {
    import spark.implicits._
    // users 1/2/4 from the ladder fixture are all DETERMINISTIC order-1
    // chains (AAAAA, ABAB, (AB)^10) — conditional entropy must be
    // exactly 0 however entropic the marginal is; user 5 mixes contexts:
    // 0,0,1,0,1,1 → c_0•=3 (c_00=1, c_01=2), c_1•=2 (c_10=1, c_11=1),
    // num = 3·lnq(3) + 2·lnq(2) − 2·lnq(2) = 3·1098612
    val rows =
      (0 until 5).map(k => (1L, k.toLong, 0L)) ++
      (0 until 4).map(k => (2L, k.toLong, (k % 2).toLong)) ++
      (0 until 20).map(k => (4L, k.toLong, (k % 2).toLong)) ++
      Seq(0L, 0L, 1L, 0L, 1L, 1L).zipWithIndex.map { case (l, k) => (5L, k.toLong, l) }
    val m = Metrics.markovEntropyQ(rows.toDF("user_id", "k", "location_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(m(1L) == ((4L, 1L, 0L, 0.0)), m(1L))
    assert(m(2L) == ((3L, 2L, 0L, 0.0)), m(2L))
    assert(m(4L) == ((19L, 2L, 0L, 0.0)), m(4L))
    assert(m(5L) == ((5L, 2L, 3L * 1098612L, 3 * 1098612 / 5e6)), m(5L))
    // a single-visit user has no transition and must drop out entirely
    val one = Metrics.markovEntropyQ(Seq((9L, 0L, 3L)).toDF("user_id", "k", "location_id"))
    assert(one.count() == 0L)
  }

  test("canonical mobility motifs: label- and direction-aware isomorphism classes") {
    import spark.implicits._
    val day = 86400000000L
    def visits(u: Long, d: Long, locs: Seq[Long]) =
      locs.zipWithIndex.map { case (l, i) => (u, i.toLong, d * day + i * 1000L, l) }
    // users 1 and 2: the same A→B→A shape under different location
    // labels — must share one motif id (bits (0,1)+(1,0) = 2+64 = 66).
    // users 3 and 5: directed path, traversed in opposite directions —
    // same unlabeled class (min mask 68 = bits (0,2)+(1,0)).
    // user 4: directed 3-cycle (min mask 4354). user 6: single location
    // (motif 0, no edges).
    val df = (visits(1L, 0L, Seq(5L, 7L, 5L)) ++
      visits(2L, 0L, Seq(9L, 3L, 9L)) ++
      visits(3L, 0L, Seq(1L, 2L, 3L)) ++
      visits(5L, 0L, Seq(3L, 2L, 1L)) ++
      visits(4L, 0L, Seq(1L, 2L, 3L, 1L)) ++
      visits(6L, 0L, Seq(8L, 8L, 8L)))
      .toDF("user_id", "k", "s_us", "location_id")
    val got = Metrics.mobilityMotifsCanonical(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((2L, 2L, 66L)), got(1L))
    assert(got(2L) == ((2L, 2L, 66L)), got(2L))
    assert(got(3L) == ((3L, 2L, 68L)), got(3L))
    assert(got(5L) == ((3L, 2L, 68L)), got(5L))
    assert(got(4L) == ((3L, 3L, 4354L)), got(4L))
    assert(got(6L) == ((1L, 0L, 0L)), got(6L))

    // a day visiting MORE than maxNodes locations is excluded BEFORE the
    // mask/permutation pipeline — its over-wide ranks would alias the
    // 6-wide bit packing and could collide with (and corrupt) a
    // legitimate day's canonicalization through the shared mask table
    val wide = visits(7L, 0L, (0L to 7L) ++ Seq(0L, 1L))
      .toDF("user_id", "k", "s_us", "location_id")
    val both = Metrics.mobilityMotifsCanonical(df.unionByName(wide)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(!both.contains(7L), s"8-location day must be excluded: $both")
    assert(both(1L) == ((2L, 2L, 66L)) && both(3L) == ((3L, 2L, 68L)),
      s"surviving days' motifs must be unchanged by the wide day: $both")
  }

  test("DTW and Frechet kernels on simple trajectories") {
    val a = Array((8.5, 47.3), (8.6, 47.3))
    val same = SpatialOps.dtw(a, a)
    assert(same == 0.0)
    assert(SpatialOps.frechet(a, a) == 0.0)
    val b = Array((8.5, 47.31), (8.6, 47.31))
    assert(SpatialOps.frechet(a, b) > 1000 && SpatialOps.frechet(a, b) < 1300)
  }

  test("Hausdorff kernel: identity, symmetry, order-blindness, Frechet bound") {
    val a = Array((8.5, 47.3), (8.6, 47.3), (8.7, 47.3))
    assert(SpatialOps.hausdorff(a, a) == 0.0)
    // parallel shifted track: every point's nearest neighbor is the
    // ~1.11 km meridian offset
    val b = Array((8.5, 47.31), (8.6, 47.31), (8.7, 47.31))
    val hab = SpatialOps.hausdorff(a, b)
    assert(hab > 1000 && hab < 1300)
    assert(SpatialOps.hausdorff(b, a) == hab)
    // Hausdorff ignores traversal order; Frechet (a coupling max) does
    // not — the reversed track is Hausdorff-0 but Frechet-far
    val rev = a.reverse
    assert(SpatialOps.hausdorff(a, rev) == 0.0)
    assert(SpatialOps.frechet(a, rev) > 10000)
    // discrete Hausdorff is a lower bound of discrete Frechet
    val c = Array((8.52, 47.305), (8.61, 47.29), (8.66, 47.33))
    assert(SpatialOps.hausdorff(a, c) <= SpatialOps.frechet(a, c))
  }

  test("jumpLengthFit: OLS replayed exactly from the jump buckets") {
    import spark.implicits._
    // zig-zag track with growing step sizes -> several distance buckets
    val pts = (0 until 40).scanLeft((0.0, 47.0)) { case ((lon, lat), i) =>
      (lon + 0.00002 * (1 << (i % 5)), lat) }
    val sp = pts.zipWithIndex.map { case ((lon, lat), i) =>
      (1L, i.toLong, i.toLong * 1000000L, lon, lat, ts("2023-01-01 00:00:00")) }
      .toDF("user_id", "id", "s_us", "lon", "lat", "started_at")
    val r = Metrics.jumpLengthFit(sp).collect().head
    // replay: same buckets from the operator's own jump column
    val jumps = Metrics.jumpLength(sp).select("jump_length").as[Option[Double]].collect()
      .flatten.map(j => math.floor(j).toLong).filter(_ >= 1L)
    val counts = jumps.groupBy(m => 63 - java.lang.Long.numberOfLeadingZeros(m)).view
      .mapValues(_.length.toLong).toMap
    def lnq(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    val xy = counts.toSeq.map { case (b, c) => (lnq(1L << b), lnq(c)) }
    val (n, sx, sy) = (xy.length.toLong, xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxy, sxx) = (xy.map(p => p._1 * p._2).sum, xy.map(p => p._1 * p._1).sum)
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(r.getAs[Long]("n_buckets") == n)
    assert(r.getAs[Double]("slope") == slope)
    assert(n >= 3) // the fixture genuinely spans buckets
  }

  test("mobilityMotifs: collapse, first-appearance relabel, and cross-user motif identity") {
    import spark.implicits._
    val day = 86400000000L
    // user 1 day 0: home work home          -> 1-2-1
    // user 2 day 0: cafe gym gym cafe       -> 1-2-1 (same motif, different places)
    // user 1 day 1: a b c                   -> 1-2-3
    val sp = Seq(
      (1L, 0L, 0L * day + 1L, 10L), (1L, 1L, 0L * day + 2L, 20L), (1L, 2L, 0L * day + 3L, 10L),
      (2L, 3L, 0L * day + 1L, 77L), (2L, 4L, 0L * day + 2L, 88L),
      (2L, 5L, 0L * day + 3L, 88L), (2L, 6L, 0L * day + 4L, 77L),
      (1L, 7L, 1L * day + 1L, 1L), (1L, 8L, 1L * day + 2L, 2L), (1L, 9L, 1L * day + 3L, 3L))
      .toDF("user_id", "id", "s_us", "location_id")
    val got = Metrics.mobilityMotifs(sp)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "1-2-1" -> ((3L, 2L, 2L)), // both users' days collapse onto one motif
      "1-2-3" -> ((3L, 3L, 1L))))
  }

  test("activityEllipse: exact grid moments and the hand-replayed orientation") {
    import spark.implicits._
    // cloud elongated along the 45° diagonal plus one off-axis point
    val pts = Seq((0.0, 0.0), (0.001, 0.001), (0.002, 0.002), (0.003, 0.003), (0.001, 0.0))
    val sp = pts.zipWithIndex.map { case ((lon, lat), i) => (1L, i.toLong, lon, lat) }
      .toDF("user_id", "id", "lon", "lat")
    val r = Metrics.activityEllipse(sp).collect().head
    val xs = pts.map(p => math.floor(p._1 * 1e6 + 0.5).toLong)
    val ys = pts.map(p => math.floor(p._2 * 1e6 + 0.5).toLong)
    val (n, sx, sy) = (pts.length.toLong, xs.sum, ys.sum)
    val (sxx, syy, sxy) = (xs.map(v => v * v).sum, ys.map(v => v * v).sum,
      xs.zip(ys).map { case (a, b) => a * b }.sum)
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("sx") == sx && r.getAs[Long]("sy") == sy)
    assert(r.getAs[java.math.BigDecimal]("sxx").longValueExact() == sxx)
    assert(r.getAs[java.math.BigDecimal]("sxy").longValueExact() == sxy)
    assert(r.getAs[java.math.BigDecimal]("varx_num").longValueExact() == n * sxx - sx * sx)
    // double tail replayed from the same exact integers
    val (vx, vy, cv) = ((n * sxx - sx * sx).toDouble / (n * n).toDouble,
      (n * syy - sy * sy).toDouble / (n * n).toDouble,
      (n * sxy - sx * sy).toDouble / (n * n).toDouble)
    assert(r.getAs[Double]("var_x") == vx && r.getAs[Double]("cov_xy") == cv)
    assert(r.getAs[Double]("theta") == math.atan2(2.0 * cv, vx - vy) / 2.0)
    // near-diagonal cloud: orientation close to 45°
    assert(math.abs(r.getAs[Double]("theta") - math.Pi / 4) < 0.2)
  }

  test("dwellTimeFit: slope/intercept equal a local replay of the bucket OLS") {
    // durations (seconds): 4x ~2s (bucket 1), 8x 4-7s (bucket 2), 2x 9s (bucket 3)
    val durs = Seq.fill(4)(2L) ++ (0 until 8).map(i => 4L + i % 4) ++ Seq(9L, 9L)
    val sp = mkSp(durs.zipWithIndex.map { case (d, i) =>
      (i.toLong, 1L, "2023-01-01 08:00:00", s"2023-01-01 08:00:0$d", 8.5, 47.3)
    }: _*)
    val r = Metrics.dwellTimeFit(sp).collect().head
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val buckets = durs.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d))
      .map { case (b, vs) => (lnq(1L << b), lnq(vs.length.toLong)) }.toSeq
    val (n, sx, sy) = (buckets.length.toLong, buckets.map(_._1).sum, buckets.map(_._2).sum)
    val sxy = buckets.map(p => p._1 * p._2).sum
    val sxx = buckets.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(r.getAs[Long]("n_buckets") == n)
    assert(r.getAs[Double]("slope") == slope)
    assert(r.getAs[Double]("intercept") ==
      ((sy.toDouble - slope * sx.toDouble) / n.toDouble) / 1e6)
    // more short stays than long: the fitted exponent is negative
    assert(slope < 0.0)
  }

  test("kRadiusGyration: concentrated top-2 user is a returner, dispersed user is not") {
    def visits(u: Long, loc: Long, n: Int, lon: Double, lat: Double, off: Int) =
      (0 until n).map(i => (off + i.toLong, u, "2023-01-01 08:00:00", "2023-01-01 09:00:00", lon, lat, loc))
    // user 1: 10+10 visits at two points 100 m apart, 1 visit ~300 m away
    // (one modest excursion: top-2 dominates the spread -> returner)
    // user 2: 5+5 visits at the same near pair, 4 visits each at three
    // far points ~20 km out (the excursions dominate -> explorer)
    val rows =
      visits(1L, 0L, 10, 8.5000, 47.3000, 0) ++ visits(1L, 1L, 10, 8.5013, 47.3000, 100) ++
        visits(1L, 2L, 1, 8.504, 47.30, 200) ++
      visits(2L, 0L, 5, 8.5000, 47.3000, 300) ++ visits(2L, 1L, 5, 8.5013, 47.3000, 400) ++
        visits(2L, 2L, 4, 8.76, 47.30, 500) ++ visits(2L, 3L, 4, 8.50, 47.48, 600) ++
        visits(2L, 4L, 4, 8.24, 47.30, 700)
    val sp = rows.toDF("id", "user_id", "s", "f", "lon", "lat", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("lon"), col("lat"), col("location_id"))
    val got = Metrics.kRadiusGyration(sp, kTop = 2)
      .select("user_id", "rg_m", "rgk_m", "is_returner")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._4 && !got(2L)._4)
    // rgk_m equals radiusGyration restricted to each user's top-2 locations
    val manual = Metrics.radiusGyration(sp.filter(col("location_id") <= 1))
      .select(col("user_id"), floor(col("radius_gyration")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L)._3 == manual(1L) && got(2L)._3 == manual(2L))
    // both users' top-2 spread is ~50 m; user 1's full spread stays
    // double that, user 2's is km-scale
    assert(got(1L)._3 < 100L && got(2L)._3 < 100L)
    assert(got(1L)._2 > 60L && got(1L)._2 < 150L && got(2L)._2 > 5000L)
  }

  test("uniquenessRisk: anonymity-set histogram over ordered top-2 signatures") {
    // u1, u2 share signature (0,1); u3 is unique (2,3); u4 has one location -> (5,-1)
    val rows = Seq(
      (1L, 0L, 3), (1L, 1L, 2), (1L, 2L, 1),
      (2L, 0L, 5), (2L, 1L, 4),
      (3L, 2L, 2), (3L, 3L, 1),
      (4L, 5L, 2)).flatMap { case (u, l, n) => (0 until n).map(_ => (u, l)) }
      .zipWithIndex.map { case ((u, l), i) => (i.toLong, u, l) }
    val got = Metrics.uniquenessRisk(rows.toDF("id", "user_id", "location_id"), kTop = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(2L -> ((1L, 2L)), 1L -> ((2L, 2L))))
  }

  test("msdCurve: buckets and squared displacements equal a local scalar replay") {
    val S = 1000000L
    // fixes: origin at t=0, then (dt sec, lon offset) pairs
    val moves = Seq((2L, 8.501), (5L, 8.501), (10L, 8.503), (40L, 8.510))
    val rows = (0L, 1L, 0L, 8.500, 47.3) +: moves.zipWithIndex.map { case ((dt, lon), i) =>
      (i + 1L, 1L, dt * S, lon, 47.3)
    }
    val got = Metrics.msdCurve(rows.toDF("id", "user_id", "t_us", "lon", "lat"))
      .select("bucket", "n_points", "sum_d2m", "mean_d2m").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        r.getAs[java.math.BigDecimal](2).longValueExact(), r.getDouble(3)))).toMap
    def d2(lon: Double): Long = {
      val h = graft.functions.GeoFunctions.haversineMeters(8.500, 47.3, lon, 47.3)
      math.floor(h * h).toLong
    }
    // buckets: dt=2,5 -> buckets 1,2; 10 -> 3; 40 -> 5
    assert(got(1L) == ((1L, d2(8.501), d2(8.501).toDouble)))
    assert(got(2L) == ((1L, d2(8.501), d2(8.501).toDouble)))
    assert(got(3L) == ((1L, d2(8.503), d2(8.503).toDouble)))
    assert(got(5L) == ((1L, d2(8.510), d2(8.510).toDouble)))
    // MSD grows with the time bucket on an outward walk
    assert(got(5L)._2 > got(1L)._2)
  }

  test("locationRankCurve: per-user ranks pool into the corpus curve; count ties break by location id") {
    // u1: loc0 x3, loc1 x1; u2: loc0 x2, loc2 x2 (tie -> loc0 is rank 1)
    val rows = Seq((1L, 0L), (1L, 0L), (1L, 0L), (1L, 1L),
      (2L, 0L), (2L, 0L), (2L, 2L), (2L, 2L))
      .zipWithIndex.map { case ((u, l), i) => (i.toLong, u, l) }
    val got = Metrics.locationRankCurve(rows.toDF("id", "user_id", "location_id"))
      .select("rank", "n_users", "sum_visits", "visit_share")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 5L, 5.0 / 8.0)))
    assert(got(2L) == ((2L, 2L, 3L, 3.0 / 8.0)))
  }

  test("homeStayShare: rank-1 dwell location and its share; dwell ties break by location id") {
    val sp = mkSp(
      (0L, 1L, "2023-01-01 00:00:00", "2023-01-01 03:00:00", 8.5, 47.3), // u1 loc0: 3h
      (1L, 1L, "2023-01-01 05:00:00", "2023-01-01 06:00:00", 8.5, 47.3), // u1 loc1: 1h
      (2L, 2L, "2023-01-01 00:00:00", "2023-01-01 02:00:00", 8.5, 47.3), // u2 loc1: 2h
      (3L, 2L, "2023-01-01 03:00:00", "2023-01-01 05:00:00", 8.5, 47.3)) // u2 loc0: 2h (tie)
      .withColumn("location_id", col("id") % 2)
    val got = Metrics.homeStayShare(sp)
      .select("user_id", "home_loc", "home_us", "total_us", "home_share")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val h = 3600000000L
    assert(got(1L) == ((1L, 0L, 3 * h, 4 * h, 0.75)))
    assert(got(2L) == ((2L, 0L, 2 * h, 4 * h, 0.5)))
  }

  test("odGravityFit: fit equals a local scalar replay; flows decay with distance") {
    val locs = Map(0L -> (8.50, 47.30), 1L -> (8.51, 47.30), 2L -> (8.56, 47.30))
    // visit sequences: heavy short-hop 0<->1 traffic, light long 0<->2
    val seqs = Map(1L -> Seq(0L, 1L, 0L, 1L, 0L, 2L), 2L -> Seq(0L, 1L, 0L, 2L, 0L, 1L))
    val rows = seqs.toSeq.flatMap { case (u, vs) =>
      vs.zipWithIndex.map { case (l, i) =>
        (u * 100 + i, u, f"2023-01-01 ${8 + i}%02d:00:00", f"2023-01-01 ${8 + i}%02d:30:00",
          locs(l)._1, locs(l)._2, l)
      }
    }
    val sp = rows.toDF("id", "user_id", "s", "f", "lon", "lat", "location_id")
      .select(col("id"), col("user_id"), to_timestamp(col("s")).as("started_at"),
        to_timestamp(col("f")).as("finished_at"), col("lon"), col("lat"), col("location_id"))
    val r = Metrics.odGravityFit(sp).collect().head
    // replay: flows over non-self transitions, single-point centroids
    val flows = seqs.values.toSeq.flatMap(_.sliding(2).map(p => (p(0), p(1))))
      .filter(p => p._1 != p._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val pts = flows.toSeq.map { case ((a, b), n) =>
      val d = math.floor(graft.functions.GeoFunctions.haversineMeters(
        locs(a)._1, locs(a)._2, locs(b)._1, locs(b)._2)).toLong
      (lnq(d), lnq(n))
    }
    val (np, sx, sy) = (pts.length.toLong, pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val slope = (BigInt(np) * sxy - BigInt(sx) * sy).toDouble / (BigInt(np) * sxx - BigInt(sx) * sx).toDouble
    assert(r.getAs[Long]("n_pairs") == np)
    assert(r.getAs[Double]("slope") == slope)
    assert(slope < 0.0) // gravity: more flow where less distance
  }

  test("locationGrowthFit: points equal a local replay of the cumulative spine") {
    // 3 users x 24 visits cycling through 4 locations: discoveries front-load
    val rows = for { u <- 1L to 3L; k <- 0L until 24L }
      yield (u * 100 + k, u, k, (k / 3) % 4, 8.5 + 0.001 * u, 47.3)
    val sp = rows.toDF("id", "user_id", "k", "location_id", "lon", "lat")
    val r = Metrics.locationGrowthFit(sp, sampleEvery = 4L).collect().head
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val firsts = rows.groupBy(t => (t._2, t._4)).values.map(_.map(_._3).min).toSeq
    val spine = rows.map(_._3 / 4).distinct.sorted
    val pts = spine.map { b =>
      val n = rows.count(_._3 / 4 <= b).toLong
      val s = firsts.count(_ / 4 <= b).toLong
      (lnq(n), lnq(s))
    }
    val (np, sx, sy) = (pts.length.toLong, pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (BigInt(np) * sxy - BigInt(sx) * sy).toDouble / (BigInt(np) * sxx - BigInt(sx) * sx).toDouble
    assert(r.getAs[Long]("n_points") == np)
    assert(r.getAs[Double]("beta") == beta)
    // sublinear growth: 0 < beta < 1 on a saturating tour
    assert(beta > 0.0 && beta < 1.0)
  }

  test("radiation model: intervening mass absorbs flux; bare pair keeps the closed form") {
    // three locations on a line ~1113 m apart; masses m0=2, m1=3, m2=1
    val sp = Seq(
      (1L, 1L, 0L, 0L, 0.0, 0.0),    // user 1: 0 -> 2 (skips over loc 1)
      (1L, 2L, 10L, 2L, 0.02, 0.0),
      (2L, 3L, 0L, 1L, 0.01, 0.0),   // user 2: two visits, no transition
      (2L, 4L, 10L, 1L, 0.01, 0.0),
      (3L, 5L, 0L, 0L, 0.0, 0.0),    // user 3: 0 -> 1 (adjacent)
      (3L, 6L, 10L, 1L, 0.01, 0.0)
    ).toDF("user_id", "id", "started_at", "location_id", "lon", "lat")
    val got = Metrics.radiationModel(sp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // 0 -> 2: loc 1 sits strictly inside the radius -> s = m1 = 3
    val far = got((0L, 2L))
    assert(far.getAs[Long]("m_from") == 2L && far.getAs[Long]("m_to") == 1L)
    assert(far.getAs[Long]("s_between") == 3L)
    assert(far.getAs[Long]("observed") == 1L)
    assert(far.getAs[Double]("p_pred") == 2.0 / 30.0) // 2*1/((2+3)(2+1+3))
    // 0 -> 1: nothing closer than the destination -> s = 0
    val near = got((0L, 1L))
    assert(near.getAs[Long]("s_between") == 0L)
    assert(near.getAs[Double]("p_pred") == 6.0 / 10.0) // 2*3/((2+0)(2+3+0))
    assert(got.size == 2)
  }

  test("dailyRange: exact per-day bounding box, diagonal equals the scalar haversine") {
    val D = 86400000000L
    val pfs = Seq(
      (1L, 1L, 100L, -122.40, 47.60),        // day 0
      (1L, 2L, 200L, -122.38, 47.61),        // day 0 -> bbox spans both
      (1L, 3L, D + 5L, -122.40, 47.60),      // day 1, single fix -> range 0
      (2L, 4L, 50L, 10.0, 50.0)              // other user
    ).toDF("user_id", "id", "t_us", "lon", "lat")
    val got = Metrics.dailyRange(pfs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val d0 = got((1L, 0L))
    assert(d0.getAs[Long]("n_fixes") == 2L)
    assert(d0.getAs[Long]("min_lon_u") == -122400000L && d0.getAs[Long]("max_lon_u") == -122380000L)
    assert(d0.getAs[Long]("min_lat_u") == 47600000L && d0.getAs[Long]("max_lat_u") == 47610000L)
    assert(d0.getAs[Double]("range_m") ==
      graft.functions.GeoFunctions.haversineMeters(-122.40, 47.60, -122.38, 47.61))
    assert(got((1L, 1L)).getAs[Double]("range_m") == 0.0)
    assert(got((2L, 0L)).getAs[Long]("n_fixes") == 1L)
  }
}
