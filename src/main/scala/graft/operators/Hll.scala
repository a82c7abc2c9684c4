package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog distinct sketch.
  *
  * Spark's built-in `approx_count_distinct` is a HLL++ whose register
  * layout is Spark-internal, so an external engine can only check it
  * "within rsd" (see CorpusOps.corpusStats). This operator is the
  * portable counterpart: the sketch is derived entirely from the md5
  * [[PortableHash.h60]] family with pure integer/string arithmetic, so a
  * SQL oracle reproduces the register table — and therefore the exact
  * sketch state — bit-for-bit. Algorithm follows Flajolet et al. 2007
  * ("HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm") with the linear-counting small-range correction of
  * Heule et al. 2013 (HLL++ §4, without the bias table).
  *
  * Layout (p = 8, m = 256 registers):
  *   h    = h60(value)            60-bit non-negative hash
  *   r    = h mod 256             register index
  *   w    = h div 256             remaining 52 bits
  *   rank = 53 - bitlength(w)     leading-zero rank in [1, 53], w=0 -> 53
  *
  * `bitlength(w) = length(bin(w))` — both Spark and DuckDB render
  * integers as minimal binary strings, so the rank is engine-exact.
  *
  * Scale: the per-group register table is `groupBy(group, r).max(rank)`
  * — map-side combinable, at most m=256 rows per group leave any
  * partition, and the final exchange is bounded by #groups x 256 rows
  * regardless of input size. This is the 100 TB cardinality path: a
  * distinct count whose shuffle carries sketches, never values, while
  * staying verifiable outside Spark. The gate surface is kept exact by
  * emitting the *scaled integer numerator* `sum_pow = sum(2^(53-rank))`
  * (max 256·2^53 < 2^62, overflow-safe) instead of the order-sensitive
  * double sum `Z = sum(2^-rank)`; [[estimate]] derives the one final
  * double from it.
  */
object Hll {

  val P: Int = 8
  val M: Int = 1 << P // 256 registers
  private val RankCap = 61 - P // 53: max rank for a 60-bit hash

  /** alpha_m for m = 256 (Flajolet et al. 2007, §4). */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  private def rank(w: Column): Column =
    when(w === 0L, lit(RankCap)).otherwise(lit(RankCap) - length(bin(w)))

  /** Per-(group, register) max rank — the full sketch state.
    * Map-side combinable; ≤ m rows per group survive any partition.
    */
  def registerTable(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = PortableHash.h60(col(valueCol))
    df.select(col(groupCol), h.as("_h"))
      .withColumn("_r", col("_h") % M)
      .withColumn("_rank", rank(expr(s"_h div $M")))
      .groupBy(col(groupCol), col("_r"))
      .agg(max("_rank").as("_mr"))
  }

  /** Collapse a register table (or a [[merge]] of several) into the
    * exact-integer per-group summary: n_registers, n_zero_registers,
    * sum_pow = Σ 2^(53 - max_rank) over occupied registers (empty
    * registers contribute 2^53 via n_zero).
    */
  def summarize(regs: DataFrame, groupCol: String): DataFrame =
    regs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("long").as("n_registers"),
        (lit(M.toLong) - count(lit(1))).cast("long").as("n_zero_registers"),
        sum(expr(s"shiftleft(cast(1 as bigint), $RankCap - _mr)")).cast("long").as("sum_pow"))

  /** Exact-integer sketch summary per group (see [[summarize]]). */
  def sketch(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    summarize(registerTable(df, groupCol, valueCol), groupCol)

  /** Merge register tables by register-wise max — the HLL union. This
    * is what makes the sketch *incremental*: daily/batch sketches can
    * be persisted as (group, register, rank) tables and merged later
    * with a shuffle bounded by #tables × #groups × m rows, never a
    * rescan of the underlying corpora; `summarize(merge(a, b)) ==
    * sketch(a ∪ b)` exactly (register max is associative/commutative/
    * idempotent).
    */
  def merge(regTables: Seq[DataFrame], groupCol: String): DataFrame = {
    require(regTables.nonEmpty, "need at least one register table")
    regTables.reduce(_.unionByName(_))
      .groupBy(col(groupCol), col("_r"))
      .agg(max("_mr").as("_mr"))
  }

  /** One final double per group: the HLL estimate with the linear-counting
    * small-range correction. Z = (sum_pow + n_zero·2^53) / 2^53.
    */
  def estimate(sketchDf: DataFrame): DataFrame = {
    val scale = math.pow(2.0, RankCap) // 2^53, exact
    val z = (col("sum_pow").cast("double") + col("n_zero_registers").cast("double") * scale) / scale
    val raw = lit(Alpha * M * M) / z
    val linear = lit(M.toDouble) * log(lit(M.toDouble) / col("n_zero_registers").cast("double"))
    sketchDf.withColumn("hll_estimate",
      when(raw <= 2.5 * M && col("n_zero_registers") > 0, linear).otherwise(raw))
  }

  /** Distinct whitespace-token estimate per group over a documents table
    * — the gate query surface (exact integers only).
    */
  def distinctTokens(docs: DataFrame, groupCol: String = "source"): DataFrame =
    sketch(
      docs.select(col(groupCol), explode(split(col("text"), " ")).as("_tok")),
      groupCol, "_tok")

  /** DuckDB twin of [[distinctTokens]]. */
  def distinctTokensSql(groupCol: String = "source"): String =
    s"""WITH toks AS (
       |  SELECT $groupCol, unnest(string_split(text, ' ')) AS tok FROM documents
       |), h AS (
       |  SELECT $groupCol, ${PortableHash.h60Sql("tok")} AS h FROM toks
       |), reg AS (
       |  SELECT $groupCol, h % $M AS r,
       |         max(CASE WHEN h // $M = 0 THEN $RankCap
       |                  ELSE $RankCap - length(bin(h // $M)) END) AS mr
       |  FROM h GROUP BY $groupCol, h % $M
       |)
       |SELECT $groupCol,
       |       CAST(count(*) AS BIGINT) AS n_registers,
       |       CAST($M - count(*) AS BIGINT) AS n_zero_registers,
       |       CAST(sum(CAST(1 AS BIGINT) << ($RankCap - mr)) AS BIGINT) AS sum_pow
       |FROM reg GROUP BY $groupCol""".stripMargin
}
