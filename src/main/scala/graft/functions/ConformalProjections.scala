package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The conformal projection family beyond transverse Mercator: Lambert
  * Conformal Conic (2SP, EPSG method 9802), ellipsoidal Mercator (1SP,
  * EPSG 9804) and spherical Web Mercator (EPSG 9841 / CRS 3857). With
  * [[Projection]]'s TM/UTM this covers the projected CRSs mobility data
  * actually arrives in (UTM and national TM grids, Lambert national
  * grids — France, Belgium, US state planes —, marine Mercator charts,
  * web-tile coordinates). Formulas are Snyder 1987 (eq. 7-x, 14-x,
  * 15-x), the same series EPSG Guidance Note 7-2 publishes.
  *
  * Everything is a pure Catalyst column expression with a scalar twin
  * written operation-for-operation identical — including Spark's split
  * libm dispatch (its Pow/Log/Exp call `StrictMath`, its trig calls
  * `Math`), which the twins mirror call-for-call — so column and scalar
  * results are bit-identical, the same contract
  * [[Projection.tmForward]]/[[Projection.tmInverse]] pin. The
  * conformal-latitude inverse has no closed form on the ellipsoid; both
  * twins unroll the standard fixed-point iteration (Snyder eq. 7-9) a
  * fixed [[ConformalProjections.PhiIters]] times — deterministic,
  * convergent to double precision for |phi| < 89.5°.
  */
object ConformalProjections {

  /** Fixed iteration count for the conformal-latitude inverse. */
  val PhiIters = 7

  /** A planar projection both as column expressions (the distributed
    * path) and scalars (driver/tests), plus the CRS label to stamp.
    */
  sealed trait PlanarProjection {
    def crs: String
    def forward(lon: Column, lat: Column): (Column, Column)
    def inverse(x: Column, y: Column): (Column, Column)
    def forwardScalar(lon: Double, lat: Double): (Double, Double)
    def inverseScalar(x: Double, y: Double): (Double, Double)
  }

  // Snyder eq. 15-9: isometric t(phi) = tan(pi/4 - phi/2) /
  //   ((1 - e sin phi)/(1 + e sin phi))^(e/2)
  // NOTE: Spark's Pow/Log/Exp expressions call StrictMath (its
  // Sin/Cos/Tan/Atan call Math) — the scalar twins mirror that choice
  // exactly, or column==scalar would drift by an ulp on fractional
  // exponents.
  private def tOf(phi: Double, e: Double): Double =
    math.tan(math.Pi / 4.0 - phi / 2.0) /
      StrictMath.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2.0)

  private def tOf(phi: Column, e: Double): Column =
    tan(lit(math.Pi / 4.0) - phi / 2.0) /
      pow((lit(1.0) - lit(e) * sin(phi)) / (lit(1.0) + lit(e) * sin(phi)), e / 2.0)

  // Snyder eq. 14-15: m(phi) = cos phi / sqrt(1 - e2 sin^2 phi)
  private def mOf(phi: Double, e2: Double): Double =
    math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi))

  // Snyder eq. 7-9: phi from t by fixed-point iteration, unrolled
  private def phiFromT(t: Double, e: Double): Double = {
    var phi = math.Pi / 2.0 - 2.0 * math.atan(t)
    var i = 0
    while (i < PhiIters) {
      phi = math.Pi / 2.0 - 2.0 * math.atan(
        t * StrictMath.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2.0))
      i += 1
    }
    phi
  }

  private def phiFromT(t: Column, e: Double): Column = {
    var phi = lit(math.Pi / 2.0) - atan(t) * 2.0
    var i = 0
    while (i < PhiIters) {
      phi = lit(math.Pi / 2.0) - atan(
        t * pow((lit(1.0) - lit(e) * sin(phi)) / (lit(1.0) + lit(e) * sin(phi)), e / 2.0)) * 2.0
      i += 1
    }
    phi
  }

  /** Lambert Conformal Conic, two standard parallels (EPSG 9802;
    * Snyder eq. 15-1..15-11). Angles in degrees, lengths in the
    * ellipsoid's unit (meters unless the CRS is a foot grid).
    */
  final case class Lcc2sp(a: Double, invF: Double,
                          lat1Deg: Double, lat2Deg: Double,
                          lat0Deg: Double, lon0Deg: Double,
                          falseEasting: Double, falseNorthing: Double,
                          crs: String = "LCC") extends PlanarProjection {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private val phi1 = math.toRadians(lat1Deg)
    private val phi2 = math.toRadians(lat2Deg)
    private val m1 = mOf(phi1, e2)
    private val m2 = mOf(phi2, e2)
    private val t1 = tOf(phi1, e)
    private val t2 = tOf(phi2, e)
    // cone constant and mapping radius factor (Snyder 15-8, 15-10)
    private val n =
      if (lat1Deg == lat2Deg) math.sin(phi1)
      else (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    private val bigF = m1 / (n * math.pow(t1, n))
    private val rho0 = a * bigF * math.pow(tOf(math.toRadians(lat0Deg), e), n)
    private val lam0 = math.toRadians(lon0Deg)

    def forward(lon: Column, lat: Column): (Column, Column) = {
      val rho = lit(a * bigF) * pow(tOf(radians(lat), e), n)
      val theta = (radians(lon) - lit(lam0)) * n
      (lit(falseEasting) + rho * sin(theta),
        lit(falseNorthing) + lit(rho0) - rho * cos(theta))
    }

    def forwardScalar(lon: Double, lat: Double): (Double, Double) = {
      val rho = a * bigF * StrictMath.pow(tOf(math.toRadians(lat), e), n)
      val theta = (math.toRadians(lon) - lam0) * n
      (falseEasting + rho * math.sin(theta),
        falseNorthing + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Column, y: Column): (Column, Column) = {
      val dx = x - lit(falseEasting)
      val dy = lit(rho0) - (y - lit(falseNorthing))
      // sign(n) folds into both operands so theta/rho' come out right on
      // south-oriented cones (Snyder p. 107 note)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = sqrt(dx * dx + dy * dy) * sgn
      val theta = atan2(dx * sgn, dy * sgn)
      val t = pow(rho / (a * bigF), 1.0 / n)
      (degrees(theta / n + lit(lam0)), degrees(phiFromT(t, e)))
    }

    def inverseScalar(x: Double, y: Double): (Double, Double) = {
      val dx = x - falseEasting
      val dy = rho0 - (y - falseNorthing)
      val sgn = if (n >= 0) 1.0 else -1.0
      val rho = math.sqrt(dx * dx + dy * dy) * sgn
      val theta = math.atan2(dx * sgn, dy * sgn)
      val t = StrictMath.pow(rho / (a * bigF), 1.0 / n)
      (math.toDegrees(theta / n + lam0), math.toDegrees(phiFromT(t, e)))
    }
  }

  /** Ellipsoidal Mercator, one standard parallel / scale factor
    * (EPSG 9804; Snyder eq. 7-6..7-10).
    */
  final case class Mercator1sp(a: Double, invF: Double, k0: Double,
                               lon0Deg: Double,
                               falseEasting: Double, falseNorthing: Double,
                               crs: String = "MERC") extends PlanarProjection {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private val lam0 = math.toRadians(lon0Deg)

    def forward(lon: Column, lat: Column): (Column, Column) = {
      val phi = radians(lat)
      (lit(falseEasting) + lit(a * k0) * (radians(lon) - lit(lam0)),
        // N = FN - a k0 ln t(phi): ln tan(pi/4 - phi/2) = -ln tan(pi/4 + phi/2)
        lit(falseNorthing) - lit(a * k0) * log(tOf(phi, e)))
    }

    def forwardScalar(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      (falseEasting + a * k0 * (math.toRadians(lon) - lam0),
        falseNorthing - a * k0 * StrictMath.log(tOf(phi, e)))
    }

    def inverse(x: Column, y: Column): (Column, Column) = {
      val t = exp((y - lit(falseNorthing)) / (-a * k0))
      (degrees((x - lit(falseEasting)) / (a * k0) + lit(lam0)),
        degrees(phiFromT(t, e)))
    }

    def inverseScalar(x: Double, y: Double): (Double, Double) = {
      val t = StrictMath.exp((y - falseNorthing) / (-a * k0))
      (math.toDegrees((x - falseEasting) / (a * k0) + lam0),
        math.toDegrees(phiFromT(t, e)))
    }
  }

  /** Spherical Web Mercator on the WGS84 semi-major axis (EPSG 9841,
    * the "Popular Visualisation Pseudo-Mercator" behind EPSG:3857 web
    * tiles). Closed-form both ways.
    */
  final case class WebMercator(crs: String = "EPSG:3857") extends PlanarProjection {
    private val a = Projection.Wgs84A

    def forward(lon: Column, lat: Column): (Column, Column) =
      (lit(a) * radians(lon),
        lit(a) * log(tan(lit(math.Pi / 4.0) + radians(lat) / 2.0)))

    def forwardScalar(lon: Double, lat: Double): (Double, Double) =
      (a * math.toRadians(lon),
        a * StrictMath.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0)))

    def inverse(x: Column, y: Column): (Column, Column) =
      (degrees(x / a), degrees(atan(exp(y / a)) * 2.0 - lit(math.Pi / 2.0)))

    def inverseScalar(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(x / a), math.toDegrees(math.atan(StrictMath.exp(y / a)) * 2.0 - math.Pi / 2.0))
  }

  /** `to_crs`-equivalent for any [[PlanarProjection]]: geographic lon/lat
    * columns → projected units with the CRS stamped so
    * [[GeoFunctions.isPlanar]] dispatches downstream math to euclidean
    * (same contract as [[Projection.toUtm]]).
    */
  def toPlanar(df: DataFrame, proj: PlanarProjection,
               lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val (x, y) = proj.forward(col(lonCol), col(latCol))
    val out = df.withColumn("_graft_x", x).withColumn("_graft_y", y)
      .withColumn(lonCol, col("_graft_x")).withColumn(latCol, col("_graft_y"))
      .drop("_graft_x", "_graft_y")
    GeoFunctions.withCrs(out, proj.crs, cols = Seq(lonCol, latCol))
  }

  /** Inverse of [[toPlanar]]: back to geographic degrees, EPSG:4326. */
  def fromPlanar(df: DataFrame, proj: PlanarProjection,
                 lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val (lo, la) = proj.inverse(col(lonCol), col(latCol))
    val out = df.withColumn("_graft_lo", lo).withColumn("_graft_la", la)
      .withColumn(lonCol, col("_graft_lo")).withColumn(latCol, col("_graft_la"))
      .drop("_graft_lo", "_graft_la")
    GeoFunctions.withCrs(out, "EPSG:4326", cols = Seq(lonCol, latCol))
  }
}
