package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving for write-time spatial clustering.
  *
  * At 100 TB the dominant spatial cost is not compute but *scan
  * selectivity*: parquet row-group min/max stats only prune a query's
  * bounding box if rows that are close in space are close in the file.
  * Sorting by `(x, y)` clusters one axis and scatters the other; sorting
  * by the bit-interleaved Morton key clusters both (the classic
  * space-filling-curve layout used by Delta/Iceberg `OPTIMIZE ZORDER`).
  *
  * The interleave is the standard parallel bit-spread (Morton 1966;
  * "Bit Twiddling Hacks" parallel-prefix masks) — five shift/mask
  * rounds per coordinate, all long-integer ops present in both Spark
  * and DuckDB, so the key (and hence the gate) is engine-exact.
  *
  * [[clusterByZOrder]] is the write-layout operator:
  * `repartitionByRange(zkey)` gives contiguous, balanced key ranges per
  * output file (range partitioning samples the key distribution, so
  * skewed geographies still split evenly) and `sortWithinPartitions`
  * orders rows inside each file so row-group stats are tight.
  */
object ZOrder {

  /** Bits per coordinate; 2·21 = 42-bit keys stay well inside a long. */
  val Bits: Int = 21
  val Max: Long = (1L << Bits) - 1L

  private val masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000ffff0000ffffL,
    8  -> 0x00ff00ff00ff00ffL,
    4  -> 0x0f0f0f0f0f0f0f0fL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 21 bits of `c` so bit i lands at position 2i. */
  def spread(c: Column): Column =
    masks.foldLeft(c.bitwiseAND(lit(Max))) { case (v, (s, m)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** DuckDB twin of [[spread]]. NOTE: textually duplicates `e` 32×, so
    * pass a column name (bind complex inputs in a CTE first).
    */
  def spreadSql(e: String): String =
    masks.foldLeft(s"(($e) & $Max)") { case (v, (s, m)) =>
      s"((($v) | (($v) << $s)) & $m)"
    }

  /** 42-bit Morton key of two coordinates in [0, 2^21). */
  def interleave(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** DuckDB twin of [[interleave]] (expects BIGINT expressions). */
  def interleaveSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Repartition + sort by the Morton key of (xCol, yCol) — the layout
    * to apply immediately before a parquet write. Range partitioning
    * keeps files balanced under skew; the within-partition sort keeps
    * row-group min/max stats tight on BOTH axes.
    */
  def clusterByZOrder(df: DataFrame, xCol: Column, yCol: Column,
                      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("_zkey", interleave(xCol, yCol))
    keyed.repartitionByRange(numPartitions, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }
}
