package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geometry/distance column functions. All are pure Catalyst expressions
  * (no UDFs) so they stay inside whole-stage codegen and remain
  * pushdown/prune friendly.
  *
  * Reference semantics: trackintel/geogr/distances.py.
  */
object GeoFunctions {

  val EarthRadiusMeters = 6371000.0

  /** Great-circle distance in meters, spherical-law-of-cosines form —
    * same formula as the reference (geogr/distances.py:15-86). The acos
    * argument is clamped to [-1, 1] to guard floating-point overshoot on
    * identical points (the clamp is value-preserving otherwise).
    */
  def haversineMeters(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val la1 = radians(lat1)
    val la2 = radians(lat2)
    val arg = cos(la1 - la2) - cos(la1) * cos(la2) * (lit(1.0) - cos(radians(lon1) - radians(lon2)))
    // guard: least/greatest skip nulls, which would otherwise turn a null
    // coordinate into acos(-1) = π·R instead of null
    when(lon1.isNotNull && lat1.isNotNull && lon2.isNotNull && lat2.isNotNull,
      lit(EarthRadiusMeters) * acos(least(lit(1.0), greatest(lit(-1.0), arg))))
  }

  /** Scalar (driver-side / test) version, identical math. */
  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val la1 = math.toRadians(lat1); val la2 = math.toRadians(lat2)
    val arg = math.cos(la1 - la2) -
      math.cos(la1) * math.cos(la2) * (1.0 - math.cos(math.toRadians(lon1) - math.toRadians(lon2)))
    EarthRadiusMeters * math.acos(math.min(1.0, math.max(-1.0, arg)))
  }

  /** meters → decimal degrees at a latitude (geogr/distances.py:188-210). */
  def metersToDecimalDegrees(meters: Column, latitude: Column): Column =
    meters / (lit(111.32 * 1000.0) * cos(radians(latitude)))

  def metersToDecimalDegrees(meters: Double, latitude: Double): Double =
    meters / (111.32 * 1000.0 * math.cos(math.toRadians(latitude)))

  /** Length in meters of a `array<struct<lon,lat>>` linestring column via
    * higher-order functions — segment-wise haversine summed with
    * `aggregate`, the codegen-friendly analogue of the reference's
    * np.bincount trick (geogr/distances.py:253-277). No UDF.
    */
  def linestringLengthMeters(points: Column): Column = {
    val segs = zip_with(
      slice(points, lit(1), greatest(size(points) - 1, lit(0))),
      slice(points, lit(2), greatest(size(points) - 1, lit(0))),
      (a, b) => haversineMeters(a.getField("lon"), a.getField("lat"), b.getField("lon"), b.getField("lat"))
    )
    coalesce(aggregate(segs, lit(0.0), (acc, x) => acc + x), lit(0.0))
  }

  /** Longitude-wrap-aware mean of points: mean latitude plus
    * atan2(mean sin lon, mean cos lon) — matches the reference's
    * angle_centroid_multipoints (preprocessing/util.py:117-143).
    * Use over grouped data: pass pre-aggregated avg(sin), avg(cos), avg(lat).
    */
  def wrapAwareMeanLon(avgSinLon: Column, avgCosLon: Column): Column =
    degrees(atan2(avgSinLon, avgCosLon))

  /** Bounding-box predicate — the cheap prefilter that replaces the
    * reference's R-tree candidate pass (geogr/filter.py:44-54). Emitted
    * explicitly so Catalyst can push it into the parquet scan.
    */
  def inBBox(lon: Column, lat: Column, minLon: Double, minLat: Double, maxLon: Double, maxLat: Double): Column =
    lon >= minLon && lon <= maxLon && lat >= minLat && lat <= maxLat

  // ---------------------------------------------------------------------
  // Small-geometry kernels (driver-free, run per-row on executors). These
  // handle the few operations Catalyst can't express: point-in-polygon,
  // convex hull. Inputs are tiny per-row/per-group structures, so a Scala
  // function (registered as a UDF at the call site) is appropriate.
  // ---------------------------------------------------------------------

  /** Ray-casting point-in-polygon (ring closed implicitly). */
  def pointInPolygon(lon: Double, lat: Double, ring: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var j = ring.length - 1
    var i = 0
    while (i < ring.length) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if (((yi > lat) != (yj > lat)) && (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Andrew's monotone-chain convex hull; input sizes are per-location
    * staypoint sets (small). Returns hull in counter-clockwise order.
    */
  def convexHull(points: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val pts = points.distinct.sorted
    if (pts.length <= 2) return pts
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val lower = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- pts) {
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0) lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- pts.reverse) {
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0) upper.remove(upper.length - 1)
      upper += p
    }
    (lower.dropRight(1) ++ upper.dropRight(1)).toSeq
  }
}
