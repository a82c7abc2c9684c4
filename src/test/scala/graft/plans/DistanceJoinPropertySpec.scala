package graft.plans

import graft.SparkSpec
import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property test for [[BandedDistanceJoin]]: the rule rewrites joins
  * INVISIBLY, so its losslessness claim gets adversarial random trials
  * against a driver-side sequential brute force — random clouds at
  * random latitudes up to the envelope edge, random radii spanning four
  * orders of magnitude (including radii near the vacuous-longitude-bound
  * crossover), points planted exactly ON band-width multiples, and a
  * duplicate-free check (each qualifying pair must appear exactly once).
  */
class DistanceJoinPropertySpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("lon", DoubleType, nullable = true),
    StructField("lat", DoubleType, nullable = true)))

  private def df(rows: Seq[(Long, Double, Double)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, lo, la) => Row(i, lo, la) }, 3),
      schema)

  test("planar random trials: banded euclidean join == sequential brute force, each pair once") {
    for (trial <- 1 to 6) {
      val rnd = new scala.util.Random(7000 + trial)
      // projected-CRS meters anywhere on a continent-scale plane,
      // radii spanning ~1 m .. ~100 km, every 4th point planted on a
      // band-width multiple (the ±1-neighbor coverage edge)
      val baseX = (rnd.nextDouble() - 0.5) * 2e7
      val baseY = (rnd.nextDouble() - 0.5) * 2e7
      val radius = math.pow(10.0, rnd.nextDouble() * 5.0)
      val w = radius * (1 + 1e-9) + 1e-6
      def cloud(n: Int, offset: Long): Seq[(Long, Double, Double)] =
        (0 until n).map { i =>
          val x0 = baseX + (rnd.nextDouble() - 0.5) * radius * 3.0
          val x = if (i % 4 == 0) math.floor(x0 / w) * w else x0
          (offset + i, x, baseY + (rnd.nextDouble() - 0.5) * radius * 3.0)
        }
      val aRows = cloud(40, 0L)
      val bRows = cloud(40, 1000L)
      val expected = (for {
        (ia, xa, ya) <- aRows; (ib, xb, yb) <- bRows
        if GeoFunctions.euclideanMeters(xa, ya, xb, yb) <= radius
      } yield (ia, ib)).toSet

      val joined = df(aRows).as("a").join(df(bRows).as("b"),
          GeoFunctions.euclideanMeters(col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
            <= lit(radius))
        .select(col("a.id").as("id_1"), col("b.id").as("id_2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_band"), s"trial $trial: planar rule did not fire\n$plan")
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"trial $trial: duplicate pairs emitted")
      assert(got.toSet == expected,
        s"trial $trial (x=$baseX y=$baseY r=$radius): " +
          s"missing=${(expected -- got.toSet).take(5)} extra=${(got.toSet -- expected).take(5)}")
    }
  }

  test("random trials: banded join == sequential brute force, each pair once") {
    for (trial <- 1 to 8) {
      val rnd = new scala.util.Random(1000 + trial)
      val baseLat = -64.0 + rnd.nextDouble() * 128.0 // stays inside the 66-deg envelope
      // full longitude circle INCLUDING the antimeridian: every third
      // trial is pinned onto the seam so the wrapped-band path gets
      // adversarial coverage, and generated lons wrap into [-180, 180]
      val baseLon =
        if (trial % 3 == 0) 180.0 - rnd.nextDouble() * 0.01
        else -180.0 + rnd.nextDouble() * 360.0
      val radius = math.pow(10.0, 1.5 + rnd.nextDouble() * 4.0) // ~30 m .. ~300 km
      val spreadDeg = math.toDegrees(radius / 6371000.0) * 3.0
      val wLat = math.toDegrees(radius / 6371000.0)
      def cloud(n: Int, offset: Long): Seq[(Long, Double, Double)] =
        (0 until n).map { i =>
          // every 5th point lands exactly on a lat-band multiple
          val lat0 = baseLat + (rnd.nextDouble() - 0.5) * spreadDeg
          val lat = if (i % 5 == 0) math.floor(lat0 / wLat) * wLat else lat0
          val lonRaw = baseLon + (rnd.nextDouble() - 0.5) * spreadDeg
          val lon = ((lonRaw + 180.0 + 720.0) % 360.0) - 180.0
          (offset + i, lon, math.max(-65.9, math.min(65.9, lat)))
        }
      val aRows = cloud(45, 0L)
      val bRows = cloud(45, 1000L)
      val expected = (for {
        (ia, loa, laa) <- aRows; (ib, lob, lab) <- bRows
        if GeoFunctions.haversineMeters(loa, laa, lob, lab) <= radius
      } yield (ia, ib)).toSet

      // alternate the predicate's surface per trial: the native
      // haversine_m node on even trials, the composed Scala-API column
      // (matched structurally since r14) on odd — both must band
      // identically under every randomized envelope/seam/band-edge case
      val dist =
        if (trial % 2 == 0)
          call_function("haversine_m", col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
        else
          GeoFunctions.haversineMeters(col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
      val joined = df(aRows).as("a").join(df(bRows).as("b"), dist <= lit(radius))
        .select(col("a.id").as("id_1"), col("b.id").as("id_2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_band"), s"trial $trial: rule did not fire\n$plan")
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"trial $trial: duplicate pairs emitted")
      assert(got.toSet == expected,
        s"trial $trial (lat=$baseLat lon=$baseLon r=$radius): " +
          s"missing=${(expected -- got.toSet).take(5)} extra=${(got.toSet -- expected).take(5)}")
    }
  }

  test("semi/anti random trials: banded blocklist filter == sequential brute force") {
    for (trial <- 1 to 6) {
      val rnd = new scala.util.Random(4000 + trial)
      val baseLat = -64.0 + rnd.nextDouble() * 128.0
      val baseLon =
        if (trial % 3 == 0) 180.0 - rnd.nextDouble() * 0.01 // pin onto the seam
        else -180.0 + rnd.nextDouble() * 360.0
      val radius = math.pow(10.0, 1.5 + rnd.nextDouble() * 4.0)
      val spreadDeg = math.toDegrees(radius / 6371000.0) * 3.0
      val wLat = math.toDegrees(radius / 6371000.0)
      def cloud(n: Int, offset: Long): Seq[(Long, Double, Double)] =
        (0 until n).map { i =>
          val lat0 = baseLat + (rnd.nextDouble() - 0.5) * spreadDeg
          val lat = if (i % 5 == 0) math.floor(lat0 / wLat) * wLat else lat0
          val lonRaw = baseLon + (rnd.nextDouble() - 0.5) * spreadDeg
          val lon = ((lonRaw + 180.0 + 720.0) % 360.0) - 180.0
          (offset + i, lon, math.max(-65.9, math.min(65.9, lat)))
        }
      val aRows = cloud(50, 0L)
      val bRows = cloud(20, 1000L)
      val nearIds = (for {
        (ia, loa, laa) <- aRows; (_, lob, lab) <- bRows
        if GeoFunctions.haversineMeters(loa, laa, lob, lab) <= radius
      } yield ia).toSet
      def run(tpe: String): Seq[Long] = {
        val joined = df(aRows).as("a").join(df(bRows).as("b"),
          GeoFunctions.haversineMeters(col("a.lon"), col("a.lat"), col("b.lon"), col("b.lat"))
            <= lit(radius), tpe)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("__graft_band"), s"trial $trial $tpe: rule did not fire\n$plan")
        joined.select(col("a.id")).collect().map(_.getLong(0)).toSeq
      }
      val semi = run("left_semi"); val anti = run("left_anti")
      assert(semi.length == semi.toSet.size && anti.length == anti.toSet.size,
        s"trial $trial: semi/anti duplicated left rows")
      assert(semi.toSet == nearIds,
        s"trial $trial (lat=$baseLat lon=$baseLon r=$radius): semi mismatch")
      assert(anti.toSet == aRows.map(_._1).toSet -- nearIds,
        s"trial $trial (lat=$baseLat lon=$baseLon r=$radius): anti mismatch")
    }
  }
}
