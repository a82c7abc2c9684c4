package graft.plans

import graft.SparkSpec
import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** [[BandedDistanceJoin]]: the naive `haversine_m(...) <= r` join must
  * plan as a banded HASH join (no cartesian, no BNLJ), return exactly
  * the brute-force pair set (each pair once), and fail LOUDLY — never
  * silently lossy — outside the declared latitude/seam envelope.
  */
class DistanceJoinRuleSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("lon", DoubleType, nullable = true),
    StructField("lat", DoubleType, nullable = true)))

  private def pts(rows: Seq[(Long, java.lang.Double, java.lang.Double)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, lo, la) => Row(i, lo, la) }, 2),
      schema)

  /** A seeded cloud around (8.5E, 47.4N) ~ Zurich, spacings of the same
    * order as the radius so both matches and non-matches exist, plus
    * points sitting exactly on multiples of the 150 m band width so the
    * band-edge / neighbor-explode path is exercised.
    */
  private def cloud(n: Int, seed: Long): Seq[(Long, java.lang.Double, java.lang.Double)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val latW = math.toDegrees(150.0 / 6371000.0)
      val onEdge = i % 7 == 0
      val lat = if (onEdge) math.floor(47.4 / latW) * latW + (i % 3) * latW
                else 47.4 + (rnd.nextDouble() - 0.5) * 0.01
      val lon = 8.5 + (rnd.nextDouble() - 0.5) * 0.02
      (i.toLong, Double.box(lon), Double.box(lat))
    }
  }

  private def naive(a: DataFrame, b: DataFrame, r: Double): DataFrame =
    a.join(b,
      call_function("haversine_m",
        a("lon"), a("lat"), b("lon"), b("lat")) <= lit(r))
      .select(a("id").as("id_1"), b("id").as("id_2"))

  /** Brute force over an explicit cross join, with the rule DISABLED —
    * since r14 the composed [[GeoFunctions.haversineMeters]] kernel is
    * itself a matched pattern, so only the kill switch guarantees an
    * un-banded ground truth.
    */
  private def brute(a: DataFrame, b: DataFrame, r: Double): Set[(Long, Long)] = {
    spark.conf.set(BandedDistanceJoin.EnabledKey, "false")
    try a.crossJoin(b.select(b("id").as("_bid"), b("lon").as("_blon"), b("lat").as("_blat")))
      .filter(GeoFunctions.haversineMeters(col("lon"), col("lat"), col("_blon"), col("_blat")) <= lit(r))
      .select(col("id"), col("_bid"))
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    finally spark.conf.unset(BandedDistanceJoin.EnabledKey)
  }

  private def planString(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.toString
  }

  test("naive haversine join plans as a banded hash join and matches brute force") {
    val a = pts(cloud(120, seed = 1))
    val b = pts(cloud(140, seed = 2).map { case (i, lo, la) => (i + 1000L, lo, la) })
    val joined = naive(a, b, 150.0)
    val rows = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty, "fixture must produce matches")
    assert(rows.length === rows.toSet.size, "each qualifying pair exactly once")
    assert(rows.toSet === brute(a, b, 150.0))

    val plan = planString(joined)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("__graft_band"), plan)
  }

  test("kill switch restores the un-rewritten plan with identical results") {
    val a = pts(cloud(40, seed = 3))
    val b = pts(cloud(40, seed = 4).map { case (i, lo, la) => (i + 1000L, lo, la) })
    val expected = brute(a, b, 200.0)
    spark.conf.set(BandedDistanceJoin.EnabledKey, "false")
    try {
      val joined = naive(a, b, 200.0)
      assert(!planString(joined).contains("__graft_band"))
      assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    } finally spark.conf.unset(BandedDistanceJoin.EnabledKey)
    assert(naive(a, b, 200.0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
  }

  test("the Scala API haversineMeters column bands exactly like the native node") {
    // the r13 blind spot: a user following the repo's own Scala API —
    // GeoFunctions.haversineMeters as the join predicate — must get the
    // banded hash join, not BNLJ, with the identical exact pair set
    val a = pts(cloud(120, seed = 11))
    val b = pts(cloud(140, seed = 12).map { case (i, lo, la) => (i + 1000L, lo, la) })
    val joined = a.join(b,
        GeoFunctions.haversineMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(150.0))
      .select(a("id").as("id_1"), b("id").as("id_2"))
    val plan = planString(joined)
    assert(plan.contains("__graft_band"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty, "fixture must produce matches")
    assert(got.length === got.toSet.size, "each qualifying pair exactly once")
    assert(got.toSet === brute(a, b, 150.0))
  }

  test("the composed spherical form honors the envelope raise too") {
    val a = pts(Seq((1L, Double.box(10.0), Double.box(80.0))))
    val b = pts(Seq((2L, Double.box(10.0001), Double.box(80.0))))
    val ex = intercept[Exception] {
      a.join(b, GeoFunctions.haversineMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(100.0))
        .collect()
    }
    assert(ex.getMessage.contains("BandedDistanceJoin"), ex.getMessage)
  }

  test("planar coordinates beyond 1e8 m raise instead of banding with an unproven pad") {
    val a = pts(Seq((1L, Double.box(2.0e8), Double.box(0.0))))
    val b = pts(Seq((2L, Double.box(2.0e8), Double.box(50.0))))
    val ex = intercept[Exception] {
      a.join(b, GeoFunctions.euclideanMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(100.0))
        .collect()
    }
    assert(ex.getMessage.contains("BandedDistanceJoin"), ex.getMessage)
    assert(ex.getMessage.contains("magnitude"), ex.getMessage)
  }

  test("LEFT SEMI distance join bands: each near-any left row exactly once, no BNLJ") {
    // the blocklist-keep shape: keep every a-point within 150 m of ANY
    // b-point. The left side must come back row-for-row (no explode
    // duplication), matched or not decided exactly as brute force says.
    val a = pts(cloud(130, seed = 21))
    val b = pts(cloud(60, seed = 22).map { case (i, lo, la) => (i + 1000L, lo, la) })
    val joined = a.join(b,
        GeoFunctions.haversineMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(150.0),
        "left_semi")
    val plan = planString(joined)
    assert(plan.contains("__graft_band"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val got = joined.select(col("id")).collect().map(_.getLong(0))
    assert(got.length === got.toSet.size, "semi join must not duplicate left rows")
    val expectedIds = brute(a, b, 150.0).map(_._1)
    assert(got.toSet === expectedIds)
    assert(got.nonEmpty && got.length < 130, "fixture needs both kept and dropped rows")
  }

  test("LEFT ANTI distance join bands: blocklist-distance filtering, exact complement") {
    val a = pts(cloud(130, seed = 21))
    val b = pts(cloud(60, seed = 22).map { case (i, lo, la) => (i + 1000L, lo, la) })
    val joined = a.join(b,
        GeoFunctions.haversineMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(150.0),
        "left_anti")
    val plan = planString(joined)
    assert(plan.contains("__graft_band"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val got = joined.select(col("id")).collect().map(_.getLong(0)).toSet
    val near = brute(a, b, 150.0).map(_._1)
    val allIds = a.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got === (allIds -- near))
    // a null-coordinate left row has a null predicate -> anti KEEPS it
    val withNull = pts(Seq((7777L, null, Double.box(47.4))))
    val kept = withNull.join(b,
        GeoFunctions.haversineMeters(withNull("lon"), withNull("lat"), b("lon"), b("lat"))
          <= lit(150.0), "left_anti")
      .collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(7777L))
  }

  test("semi/anti partition the left side and honor the envelope raise") {
    val a = pts(cloud(80, seed = 31))
    val b = pts(cloud(40, seed = 32).map { case (i, lo, la) => (i + 1000L, lo, la) })
    def ids(tpe: String): Set[Long] = a.join(b,
        call_function("haversine_m", a("lon"), a("lat"), b("lon"), b("lat")) <= lit(200.0), tpe)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val semi = ids("left_semi"); val anti = ids("left_anti")
    assert((semi & anti).isEmpty && (semi ++ anti).size == 80)
    // envelope: polar data raises loudly on the semi path too
    val polarA = pts(Seq((1L, Double.box(10.0), Double.box(80.0))))
    val polarB = pts(Seq((2L, Double.box(10.0001), Double.box(80.0))))
    val ex = intercept[Exception] {
      polarA.join(polarB,
        call_function("haversine_m", polarA("lon"), polarA("lat"), polarB("lon"), polarB("lat"))
          <= lit(100.0), "left_semi").collect()
    }
    assert(ex.getMessage.contains("BandedDistanceJoin"), ex.getMessage)
  }

  test("latitude beyond the declared envelope raises instead of dropping pairs") {
    val a = pts(Seq((1L, Double.box(10.0), Double.box(80.0))))
    val b = pts(Seq((2L, Double.box(10.0001), Double.box(80.0))))
    val ex = intercept[Exception] { naive(a, b, 100.0).collect() }
    assert(ex.getMessage.contains("BandedDistanceJoin"), ex.getMessage)
  }

  test("widening the envelope conf admits high-latitude data, still exact") {
    val rows = (0 until 60).map { i =>
      // ~50 m lon spacing at 80N (1 deg lon ~ 19.3 km there)
      (i.toLong, Double.box(10.0 + i * 0.0026), Double.box(80.0 + (i % 5) * 1e-4))
    }
    val a = pts(rows)
    val b = pts(rows.map { case (i, lo, la) => (i + 1000L, lo, la) })
    spark.conf.set(BandedDistanceJoin.MaxAbsLatKey, "85.0")
    try {
      val got = naive(a, b, 120.0).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size)
      assert(got.toSet === brute(a, b, 120.0))
    } finally spark.conf.unset(BandedDistanceJoin.MaxAbsLatKey)
  }

  test("pairs straddling the antimeridian seam join exactly via wrapped bands") {
    // a Pacific cloud split across ±180: every physical near pair must
    // be found exactly once, including the ones whose raw lon difference
    // is ~360 deg, with no raise and no double count.
    val rnd = new scala.util.Random(99)
    val rows = (0 until 80).map { i =>
      val lonRaw = 180.0 + (rnd.nextDouble() - 0.5) * 0.02 // +-0.01 deg of the seam
      val lon = if (lonRaw > 180.0) lonRaw - 360.0 else lonRaw
      (i.toLong, Double.box(lon), Double.box(10.0 + (rnd.nextDouble() - 0.5) * 0.01))
    }
    val a = pts(rows)
    val b = pts(rows.map { case (i, lo, la) => (i + 1000L, lo, la) })
    val joined = naive(a, b, 150.0)
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "each wrapped pair exactly once")
    assert(got.toSet === brute(a, b, 150.0))
    assert(got.exists { case (i1, i2) =>
      val l1 = rows(i1.toInt)._2.doubleValue; val l2 = rows((i2 - 1000L).toInt)._2.doubleValue
      math.abs(l1 - l2) > 180.0
    }, "fixture must contain at least one pair straddling the seam")
    val plan = planString(joined)
    assert(plan.contains("__graft_band") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("longitude outside [-180, 180] raises instead of banding wrong") {
    val a = pts(Seq((1L, Double.box(190.0), Double.box(10.0))))
    val b = pts(Seq((2L, Double.box(-170.0), Double.box(10.0))))
    val ex = intercept[Exception] { naive(a, b, 100.0).collect() }
    assert(ex.getMessage.contains("BandedDistanceJoin"), ex.getMessage)
    assert(ex.getMessage.contains(BandedDistanceJoin.EnabledKey), ex.getMessage)
  }

  test("a hot band-cell raises the per-task pair budget with the tiling hint") {
    // PACKED geometry: every point within ~10 m, so banding degenerates
    // to one cell and the candidate volume is |a|x|b| = 9e6 over the
    // tiny per-task budget we set — the guard must raise as soon as one
    // task passes the budget, not grind through the whole cell.
    val rnd = new scala.util.Random(7)
    def packed(n: Int, off: Long) = (0 until n).map { i =>
      (off + i, Double.box(8.5 + (rnd.nextDouble() - 0.5) * 1e-4),
        Double.box(47.4 + (rnd.nextDouble() - 0.5) * 1e-4))
    }
    val a = pts(packed(3000, 0L))
    val b = pts(packed(3000, 10000L))
    // 9e6 candidates against a 500k run budget (2e6 per-task cap): the
    // sort-merge single-cell run trips the former; a broadcast-hash
    // plan (interleaved runs) trips the latter — loud either way
    spark.conf.set(BandedDistanceJoin.MaxPairsPerTaskKey, "500000")
    try {
      val ex = intercept[Exception] { naive(a, b, 100.0).collect() }
      val msg = String.valueOf(ex.getMessage) + String.valueOf(ex.getCause)
      assert(msg.contains("hot band-cell"), msg)
      assert(msg.contains(BandedDistanceJoin.SpreadFactorKey), msg)
    } finally spark.conf.unset(BandedDistanceJoin.MaxPairsPerTaskKey)
  }

  test("spreadFactor tiles hot cells: packed geometry completes exactly, each pair once") {
    val rnd = new scala.util.Random(8)
    def packed(n: Int, off: Long) = (0 until n).map { i =>
      (off + i, Double.box(8.5 + (rnd.nextDouble() - 0.5) * 1e-4),
        Double.box(47.4 + (rnd.nextDouble() - 0.5) * 1e-4))
    }
    val a = pts(packed(300, 0L))
    val b = pts(packed(300, 10000L))
    val expected = brute(a, b, 50.0)
    spark.conf.set(BandedDistanceJoin.SpreadFactorKey, "8")
    // 300*300 = 90k pairs in one cell would blow a 50k per-task budget
    // un-tiled; 8 tiles put ~11k per tile-task, far under it
    spark.conf.set(BandedDistanceJoin.MaxPairsPerTaskKey, "50000")
    try {
      val joined = naive(a, b, 50.0)
      assert(planString(joined).contains("__graft_band_tile"), planString(joined))
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, "tiling must not double-count pairs")
      assert(got.toSet === expected)
    } finally {
      spark.conf.unset(BandedDistanceJoin.SpreadFactorKey)
      spark.conf.unset(BandedDistanceJoin.MaxPairsPerTaskKey)
    }
  }

  test("the budget guard is in the residual by default and gone when disabled") {
    val a = pts(cloud(30, seed = 21))
    val b = pts(cloud(30, seed = 22).map { case (i, lo, la) => (i + 1000L, lo, la) })
    assert(planString(naive(a, b, 150.0)).contains("graft_pair_budget"))
    spark.conf.set(BandedDistanceJoin.MaxPairsPerTaskKey, "0")
    try {
      val joined = naive(a, b, 150.0)
      val plan = planString(joined)
      assert(plan.contains("__graft_band") && !plan.contains("graft_pair_budget"), plan)
      assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        brute(a, b, 150.0))
    } finally spark.conf.unset(BandedDistanceJoin.MaxPairsPerTaskKey)
  }

  test("the planar euclidean join gets the same banding: exact, no BNLJ, any quadrant") {
    // projected-CRS coordinates in meters, straddling 0 on both axes so
    // negative-floor banding is exercised; spacing of the same order as
    // the 150 m radius
    val rnd = new scala.util.Random(31)
    def cloudXY(n: Int, off: Long): Seq[(Long, java.lang.Double, java.lang.Double)] =
      (0 until n).map { i =>
        (off + i, Double.box((rnd.nextDouble() - 0.5) * 2000.0),
          Double.box((rnd.nextDouble() - 0.5) * 1000.0))
      }
    val a = pts(cloudXY(120, 0L))
    val b = pts(cloudXY(140, 1000L))
    def planarJoin(r: Double) = a.join(b,
        GeoFunctions.euclideanMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(r))
      .select(a("id").as("id_1"), b("id").as("id_2"))
    // brute force with the rule disabled (the composed planar kernel IS
    // the matched pattern, so the un-killed crossJoin+filter would be
    // rewritten too)
    spark.conf.set(BandedDistanceJoin.EnabledKey, "false")
    val expected =
      try planarJoin(150.0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset(BandedDistanceJoin.EnabledKey)
    assert(expected.nonEmpty, "fixture must produce matches")

    val joined = planarJoin(150.0)
    val plan = planString(joined)
    assert(plan.contains("__graft_band"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "each qualifying pair exactly once")
    assert(got.toSet === expected)
  }

  test("planar nulls flow through as non-matches and high 'latitudes' need no envelope") {
    // projected y far beyond 66 — the spherical envelope must NOT apply
    // to the planar form
    val a = pts(Seq((1L, Double.box(500000.0), Double.box(7800000.0)),
      (2L, Double.box(500000.0), null)))
    val b = pts(Seq((3L, Double.box(500080.0), Double.box(7800000.0))))
    val got = a.join(b,
        GeoFunctions.euclideanMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(100.0))
      .select(a("id").as("id_1"), b("id").as("id_2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 3L)))
  }

  test("a huge maxPairsPerTask disables the budget without overflowing") {
    // 9e18 ~ Long.MaxValue: the 4x-spread task cap must saturate, not
    // wrap negative and raise on the first candidate pair
    val a = pts(cloud(40, seed = 51))
    val b = pts(cloud(40, seed = 52).map { case (i, lo, la) => (i + 1000L, lo, la) })
    spark.conf.set(BandedDistanceJoin.MaxPairsPerTaskKey, "9000000000000000000")
    try {
      val got = naive(a, b, 150.0).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet === brute(a, b, 150.0))
    } finally spark.conf.unset(BandedDistanceJoin.MaxPairsPerTaskKey)
  }

  test("a SELF-join through aliases bands like any two-table join") {
    val rows = cloud(150, seed = 41)
    val a = pts(rows)
    val joined = a.as("x").join(a.as("y"),
        call_function("haversine_m",
          col("x.lon"), col("x.lat"), col("y.lon"), col("y.lat")) <= lit(100.0))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_1"), col("y.id").as("id_2"))
    val plan = planString(joined)
    assert(plan.contains("__graft_band") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size)
    val expectedAll = brute(a, a, 100.0).filter { case (i, j) => i < j }
    assert(got.toSet === expectedAll)
  }

  test("null coordinates flow through as non-matches, never errors") {
    val a = pts(Seq((1L, Double.box(8.5), null), (2L, Double.box(8.5), Double.box(47.4))))
    val b = pts(Seq((3L, Double.box(8.5), Double.box(47.4))))
    val got = naive(a, b, 50.0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 3L)))
  }

  test("an existing equi-conjunct suppresses the rewrite") {
    val a = pts(cloud(30, seed = 5)).withColumn("user", col("id") % 3)
    val b = pts(cloud(30, seed = 6)).withColumn("user", col("id") % 3)
      .select(col("id").as("bid"), col("lon").as("blon"), col("lat").as("blat"), col("user").as("buser"))
    val joined = a.join(b,
      col("user") === col("buser") &&
        call_function("haversine_m", col("lon"), col("lat"), col("blon"), col("blat")) <= lit(500.0))
    assert(!planString(joined).contains("__graft_band"))
    assert(joined.count() > 0)
  }

  test("the SQL surface gets the same rewrite as the DataFrame API") {
    val a = pts(cloud(40, seed = 11))
    val b = pts(cloud(40, seed = 12).map { case (i, lo, la) => (i + 1000L, lo, la) })
    a.createOrReplaceTempView("dj_a")
    b.createOrReplaceTempView("dj_b")
    val joined = spark.sql(
      """SELECT a.id AS id_1, b.id AS id_2 FROM dj_a a JOIN dj_b b
        |ON haversine_m(a.lon, a.lat, b.lon, b.lat) <= 150.0""".stripMargin)
    val plan = planString(joined)
    assert(plan.contains("__graft_band"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      brute(a, b, 150.0))
  }

  test("SQL EXISTS / NOT EXISTS distance subqueries band as semi/anti") {
    // the SQL spelling of the blocklist filter: Catalyst rewrites the
    // correlated EXISTS into LeftSemi/LeftAnti with the distance
    // predicate as the join condition — exactly the shape the rule
    // bands since r14
    val a = pts(cloud(60, seed = 41))
    val b = pts(cloud(25, seed = 42).map { case (i, lo, la) => (i + 1000L, lo, la) })
    a.createOrReplaceTempView("dj_sa")
    b.createOrReplaceTempView("dj_sb")
    val near = brute(a, b, 150.0).map(_._1)
    def run(not: String): Set[Long] = {
      val q = spark.sql(
        s"""SELECT a.id FROM dj_sa a
           |WHERE $not EXISTS (SELECT 1 FROM dj_sb b
           |  WHERE haversine_m(a.lon, a.lat, b.lon, b.lat) <= 150.0)""".stripMargin)
      val plan = planString(q)
      assert(plan.contains("__graft_band"), s"'$not EXISTS' did not band:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
      q.collect().map(_.getLong(0)).toSet
    }
    assert(run("") === near)
    assert(run("NOT") === a.select(col("id")).collect().map(_.getLong(0)).toSet -- near)
  }

  test("LEFT OUTER distance join bands: matched pairs exact, unmatched null-extend once") {
    val a = pts(cloud(100, seed = 61))
    val b = pts(cloud(45, seed = 62).map { case (i, lo, la) => (i + 1000L, lo, la) })
    def q: DataFrame = a.join(b,
        GeoFunctions.haversineMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(150.0),
        "left_outer")
      .select(a("id").as("id_1"), b("id").as("id_2"))
    val plan = planString(q)
    assert(plan.contains("__graft_band"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    def rows(df: DataFrame): Seq[(Long, Long)] = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq.sorted
    val got = rows(q)
    val want = locally {
      spark.conf.set(BandedDistanceJoin.EnabledKey, "false")
      try rows(q) finally spark.conf.unset(BandedDistanceJoin.EnabledKey)
    }
    assert(got === want)
    assert(got.exists(_._2 == -1L) && got.exists(_._2 != -1L),
      "fixture needs both matched and unmatched left rows")
    assert(got.length === got.size && got.map(_._1).distinct.size < got.length,
      "fixture needs a left row with several matches (multiplicity check)")
  }

  test("RIGHT OUTER distance join bands through the mirrored shape") {
    val a = pts(cloud(45, seed = 63))
    val b = pts(cloud(100, seed = 64).map { case (i, lo, la) => (i + 1000L, lo, la) })
    def q: DataFrame = a.join(b,
        GeoFunctions.haversineMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(150.0),
        "right_outer")
      .select(a("id").as("id_1"), b("id").as("id_2"))
    val plan = planString(q)
    assert(plan.contains("__graft_band"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    def rows(df: DataFrame): Seq[(Long, Long)] = df.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toSeq.sorted
    val got = rows(q)
    val want = locally {
      spark.conf.set(BandedDistanceJoin.EnabledKey, "false")
      try rows(q) finally spark.conf.unset(BandedDistanceJoin.EnabledKey)
    }
    assert(got === want)
    assert(got.exists(_._1 == -1L) && got.exists(_._1 != -1L),
      "fixture needs both matched and unmatched right rows")
  }

  test("FULL OUTER distance join stays BNLJ but carries the per-task pair budget") {
    // the negative pin (r14 verdict #5): full outer is the documented
    // unbandable shape — the plan must STILL be a BNLJ, but with the
    // keyless PairBudgetGuard attached so the gap is loud at scale
    // rather than a silent quadratic hang
    val a = pts(cloud(60, seed = 65))
    val b = pts(cloud(40, seed = 66).map { case (i, lo, la) => (i + 1000L, lo, la) })
    def q: DataFrame = a.join(b,
        GeoFunctions.haversineMeters(a("lon"), a("lat"), b("lon"), b("lat")) <= lit(150.0),
        "full_outer")
      .select(a("id").as("id_1"), b("id").as("id_2"))
    val plan = planString(q)
    assert(!plan.contains("__graft_band"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("graft_pair_budget"), plan)
    def rows(df: DataFrame): Seq[(Long, Long)] = df.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                 if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq.sorted
    val got = rows(q)
    val want = locally {
      spark.conf.set(BandedDistanceJoin.EnabledKey, "false")
      try rows(q) finally spark.conf.unset(BandedDistanceJoin.EnabledKey)
    }
    assert(got === want)
    assert(got.exists(_._1 == -1L) && got.exists(_._2 == -1L),
      "fixture needs unmatched rows on both sides")
    // the guard raises loudly past the budget, naming the split recipe
    spark.conf.set(BandedDistanceJoin.MaxPairsPerTaskKey, "100")
    try {
      val ex = intercept[Exception] { q.collect() }
      val msg = String.valueOf(ex.getMessage) + String.valueOf(ex.getCause)
      assert(msg.contains("full-outer"), msg)
      assert(msg.contains("UNION ALL"), msg)
    } finally spark.conf.unset(BandedDistanceJoin.MaxPairsPerTaskKey)
  }

  test("a huge radius degrades to latitude-only banding but stays exact (wrap included)") {
    // 300 km at cap 66 deg: sin(r/2R)/cos(66) < 1 so lon banding still
    // applies; also check a radius so large the lon bound is vacuous
    val coords = Seq(
      (1L, Double.box(179.9), Double.box(0.0)),
      (2L, Double.box(-179.9), Double.box(0.0)),
      (3L, Double.box(0.0), Double.box(0.0)))
    val a = pts(coords)
    val b = pts(coords)
    val r = 7000000.0 // lon bound vacuous at this radius -> single lon band
    val got = naive(a, b, r).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === brute(a, b, r))
    assert(got.contains((1L, 2L)), "wrapped near pair must be found in vacuous-bound mode")
  }
}
