package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geodetic datum shifts: geographic ↔ geocentric conversion and the
  * Helmert 7-parameter similarity transform (EPSG method 9606, position
  * vector convention) — the piece of `to_crs` that [[Projection]] and
  * [[ConformalProjections]] leave out. pyproj routes any cross-datum
  * reprojection (e.g. EPSG:4277 OSGB36 → EPSG:4326 WGS84, reference
  * geogr/distances.py:213-250) through exactly this chain:
  * geodetic→XYZ on the source ellipsoid, 7-parameter similarity in
  * geocentric space, XYZ→geodetic on the target ellipsoid.
  *
  * Formulas are the public EPSG Guidance Note 7-2 ones (§4.1.1
  * geographic/geocentric, §4.3.3.1 position vector); the inverse
  * geodetic conversion is Bowring's closed form (Bowring 1976), exact to
  * well under a millimeter anywhere near the Earth's surface. Column and
  * scalar twins keep the SAME operation order and the same libm split
  * (java.lang.Math trig — what Spark's codegen kernels call; no
  * pow/log/exp at all), so column == scalar holds bit-for-bit.
  */
object Datum {

  /** Reference ellipsoid (semi-major axis, inverse flattening). */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2.0 - f)
    val b: Double = a * (1.0 - f)
    /** second eccentricity squared e'² = e²/(1−e²) */
    val ep2: Double = e2 / (1.0 - e2)
  }

  val Wgs84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val Grs80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)
  /** Airy 1830 (OSGB36). */
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 299.3249646)
  /** International 1924 (ED50 and most pre-WGS European datums). */
  val Intl1924: Ellipsoid = Ellipsoid(6378388.0, 297.0)

  /** Helmert 7-parameter set, position vector convention (EPSG 9606):
    * translations in meters, rotations in arc-seconds, scale in ppm.
    * In this convention the rotation matrix applies `+rz` to X←Y (the
    * coordinate-frame convention used by NATO flips the rotation signs —
    * EPSG GN7-2 documents both; parameters below are position vector).
    */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
                           rxSec: Double, rySec: Double, rzSec: Double,
                           scalePpm: Double) {
    private val sec2rad = Math.PI / (180.0 * 3600.0)
    val rx: Double = rxSec * sec2rad
    val ry: Double = rySec * sec2rad
    val rz: Double = rzSec * sec2rad
    val s: Double = 1.0 + scalePpm * 1e-6
    /** Small-parameter inverse (the standard EPSG reversal: negate all
      * seven). Exact only to the second order of the parameters — for a
      * large national set like OSGB36 (450 m translations, 20 ppm scale)
      * that is centimeter-scale, far inside the set's own ~5 m published
      * accuracy; the property spec pins the bound.
      */
    def inverse: Helmert = Helmert(-tx, -ty, -tz, -rxSec, -rySec, -rzSec, -scalePpm)
  }

  /** WGS84 → OSGB36 (EPSG transformation 1314 reversed; the parameter
    * set published in the OS "A guide to coordinate systems in Great
    * Britain", §6.6). ~5 m nominal accuracy — the published single-set
    * national approximation.
    */
  val Wgs84ToOsgb36: Helmert =
    Helmert(-446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421, 20.4894)

  /** OSGB36 → WGS84 (EPSG 1314). */
  val Osgb36ToWgs84: Helmert = Wgs84ToOsgb36.inverse

  // ---------------- geographic -> geocentric (GN7-2 §4.1.1) ----------------

  /** Geodetic (degrees, meters) → geocentric XYZ (meters), column form. */
  def geodeticToGeocentric(lonDeg: Column, latDeg: Column, h: Column,
                           ell: Ellipsoid): (Column, Column, Column) = {
    val phi = radians(latDeg); val lam = radians(lonDeg)
    val sinP = sin(phi); val cosP = cos(phi)
    val nu = lit(ell.a) / sqrt(lit(1.0) - lit(ell.e2) * sinP * sinP)
    val x = (nu + h) * cosP * cos(lam)
    val y = (nu + h) * cosP * sin(lam)
    val z = (nu * lit(1.0 - ell.e2) + h) * sinP
    (x, y, z)
  }

  /** Scalar twin of the column form (same order, same libm calls). */
  def geodeticToGeocentric(lonDeg: Double, latDeg: Double, h: Double,
                           ell: Ellipsoid): (Double, Double, Double) = {
    val phi = Math.toRadians(latDeg); val lam = Math.toRadians(lonDeg)
    val sinP = Math.sin(phi); val cosP = Math.cos(phi)
    val nu = ell.a / Math.sqrt(1.0 - ell.e2 * sinP * sinP)
    val x = (nu + h) * cosP * Math.cos(lam)
    val y = (nu + h) * cosP * Math.sin(lam)
    val z = (nu * (1.0 - ell.e2) + h) * sinP
    (x, y, z)
  }

  // ---------------- Helmert similarity (GN7-2 §4.3.3.1) ----------------

  /** Position-vector 7-parameter transform, column form. */
  def helmertShift(x: Column, y: Column, z: Column, p: Helmert): (Column, Column, Column) = {
    val x2 = lit(p.tx) + lit(p.s) * (x - lit(p.rz) * y + lit(p.ry) * z)
    val y2 = lit(p.ty) + lit(p.s) * (lit(p.rz) * x + y - lit(p.rx) * z)
    val z2 = lit(p.tz) + lit(p.s) * (-lit(p.ry) * x + lit(p.rx) * y + z)
    (x2, y2, z2)
  }

  /** Scalar twin. */
  def helmertShift(x: Double, y: Double, z: Double, p: Helmert): (Double, Double, Double) = {
    val x2 = p.tx + p.s * (x - p.rz * y + p.ry * z)
    val y2 = p.ty + p.s * (p.rz * x + y - p.rx * z)
    val z2 = p.tz + p.s * (-p.ry * x + p.rx * y + z)
    (x2, y2, z2)
  }

  // ---------------- geocentric -> geographic (Bowring 1976) ----------------

  /** Geocentric XYZ (meters) → geodetic (degrees, meters), column form. */
  def geocentricToGeodetic(x: Column, y: Column, z: Column,
                           ell: Ellipsoid): (Column, Column, Column) = {
    val pr = sqrt(x * x + y * y)
    val theta = atan2(z * lit(ell.a), pr * lit(ell.b))
    val sinT = sin(theta); val cosT = cos(theta)
    val phi = atan2(z + lit(ell.ep2 * ell.b) * sinT * sinT * sinT,
      pr - lit(ell.e2 * ell.a) * cosT * cosT * cosT)
    val sinP = sin(phi); val cosP = cos(phi)
    val nu = lit(ell.a) / sqrt(lit(1.0) - lit(ell.e2) * sinP * sinP)
    val h = pr / cosP - nu
    (degrees(atan2(y, x)), degrees(phi), h)
  }

  /** Scalar twin. */
  def geocentricToGeodetic(x: Double, y: Double, z: Double,
                           ell: Ellipsoid): (Double, Double, Double) = {
    val pr = Math.sqrt(x * x + y * y)
    val theta = Math.atan2(z * ell.a, pr * ell.b)
    val sinT = Math.sin(theta); val cosT = Math.cos(theta)
    val phi = Math.atan2(z + ell.ep2 * ell.b * sinT * sinT * sinT,
      pr - ell.e2 * ell.a * cosT * cosT * cosT)
    val sinP = Math.sin(phi); val cosP = Math.cos(phi)
    val nu = ell.a / Math.sqrt(1.0 - ell.e2 * sinP * sinP)
    val h = pr / cosP - nu
    (Math.toDegrees(Math.atan2(y, x)), Math.toDegrees(phi), h)
  }

  // ---------------- composed datum shift ----------------

  /** Full datum shift geodetic→geodetic, column form: source ellipsoid →
    * XYZ → Helmert → target ellipsoid. Scan-stage trig only; one pass.
    */
  def datumShift(lonDeg: Column, latDeg: Column, h: Column,
                 from: Ellipsoid, to: Ellipsoid, p: Helmert): (Column, Column, Column) = {
    val (x, y, z) = geodeticToGeocentric(lonDeg, latDeg, h, from)
    val (x2, y2, z2) = helmertShift(x, y, z, p)
    geocentricToGeodetic(x2, y2, z2, to)
  }

  /** Scalar twin. */
  def datumShift(lonDeg: Double, latDeg: Double, h: Double,
                 from: Ellipsoid, to: Ellipsoid, p: Helmert): (Double, Double, Double) = {
    val (x, y, z) = geodeticToGeocentric(lonDeg, latDeg, h, from)
    val (x2, y2, z2) = helmertShift(x, y, z, p)
    geocentricToGeodetic(x2, y2, z2, to)
  }

  /** Frame form: WGS84 lon/lat columns → OSGB36 lon/lat (+ellipsoidal
    * height) appended. The common trackintel case: GPS fixes against a
    * national-grid basemap.
    */
  def toOsgb36(df: DataFrame, lonCol: String = "longitude", latCol: String = "latitude"): DataFrame = {
    val (lon2, lat2, h2) = datumShift(col(lonCol), col(latCol), lit(0.0),
      Wgs84, Airy1830, Wgs84ToOsgb36)
    df.withColumn("lon_osgb36", lon2).withColumn("lat_osgb36", lat2)
      .withColumn("h_osgb36", h2)
  }
}
