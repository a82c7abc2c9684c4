package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Standard base-32 geohash encoding (Niemeyer 2008, public domain
  * algorithm) as a single codegen-friendly expression.
  *
  * Geohashes give mobility data a hierarchical spatial key: a prefix
  * IS a containing cell, so `groupBy(geohash)` at any precision is a
  * plain hash aggregation (map-side combinable) and prefix filters
  * (`startswith`) prune like a spatial index without one. This is the
  * cheap companion to the integer-grid cells used by the staypoint /
  * location operators when results must interoperate with external
  * systems that speak geohash.
  *
  * Construction is the closed form, not the per-bit bisection loop:
  * quantize both axes to k = 5·precision/2 bits, bit-interleave
  * (lon occupies the leading bit, per the standard), then emit 5-bit
  * groups through the base-32 alphabet. All arithmetic is
  * double-quantization with one fixed operation order plus integer
  * shifts, so the DuckDB twin is bit-exact.
  */
object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def checkPrecision(precision: Int): Int = {
    require(precision >= 2 && precision <= 8 && precision % 2 == 0,
      s"precision must be even in [2, 8], got $precision (odd precisions split a bit across axes)")
    5 * precision / 2 // bits per axis
  }

  /** Geohash string of (lon, lat) at the given even precision. */
  def encode(lon: Column, lat: Column, precision: Int = 6): Column = {
    val k = checkPrecision(precision)
    val max = (1L << k) - 1L
    // clamp BOTH ends: coordinates beyond range (malformed GPS like
    // lon = -999) must pin to the boundary cell, not wrap through the
    // bit-spread mask into an arbitrary valid-looking hash
    def quant(c: Column, offset: Double, span: Double): Column =
      greatest(least(
        floor((c + lit(offset)) / lit(span) * lit((1L << k).toDouble)).cast("long"),
        lit(max)), lit(0L))
    val lonQ = quant(lon, 180.0, 360.0)
    val latQ = quant(lat, 90.0, 180.0)
    // geohash bit order from the top: lon, lat, lon, lat, ... so lon
    // sits at odd positions-from-bottom = the shifted side of the
    // interleave, lat at even.
    val code = ZOrder.spread(latQ).bitwiseOR(shiftleft(ZOrder.spread(lonQ), 1))
    val chars = (0 until precision).map { j =>
      val shift = 5 * (precision - 1 - j)
      lit(Alphabet).substr(
        (shiftrightunsigned(code, shift).bitwiseAND(lit(31L)) + 1L).cast("int"), lit(1))
    }
    concat(chars: _*)
  }

  /** SQL twin of one axis' quantization (the single source the full
    * [[encodeSql]] expansion AND CTE-structured oracles both build on).
    */
  def quantSql(e: String, precision: Int, isLat: Boolean): String = {
    val k = checkPrecision(precision)
    val max = (1L << k) - 1L
    val (offset, span) = if (isLat) ("90.0", 180.0) else ("180.0", 360.0)
    s"greatest(least(CAST(floor((($e) + $offset) / $span * ${(1L << k).toDouble}) AS BIGINT), $max), 0)"
  }

  /** SQL emitting the base-32 chars of an already-bound `code` column. */
  def charsSql(codeCol: String, precision: Int): String = {
    checkPrecision(precision)
    (0 until precision).map { j =>
      val shift = 5 * (precision - 1 - j)
      s"substring('$Alphabet', CAST(((($codeCol >> $shift) & 31) + 1) AS INT), 1)"
    }.mkString("(", " || ", ")")
  }

  /** DuckDB twin of [[encode]] (same operation order, bit-exact).
    * NOTE: textually expands the spread 64×; bind complex lon/lat in a
    * CTE first, or compose [[quantSql]]/[[charsSql]] with
    * [[ZOrder.spreadSql]] over bound columns as the gate oracle does.
    */
  def encodeSql(lon: String, lat: String, precision: Int = 6): String = {
    val code = s"(${ZOrder.spreadSql(quantSql(lat, precision, isLat = true))}" +
      s" | (${ZOrder.spreadSql(quantSql(lon, precision, isLat = false))} << 1))"
    charsSql(code, precision)
  }
}
