package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Pins the native [[ArgminQuantizedL2]] kernel against the composed
  * `least(struct(aggregate(zip_with(q, cent, ...)), id), ...)` chain it
  * replaced in [[graft.operators.KMeans.nearestScored]] — bit-identical
  * (d, c) on randoms, ties, and every null/mismatch corner, so every
  * oracle-checked assignment/encode trajectory is unchanged.
  */
class ArgminExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def native(cents: Array[Array[Long]], q: Column): Column =
    ColumnShim.column(ArgminQuantizedL2(ColumnShim.expression(q), cents))

  /** The pre-kernel composed form, verbatim. */
  private def composed(cents: Array[Array[Long]], qCol: Column): Column = {
    val scored = cents.zipWithIndex.map { case (cv, ci) =>
      val d = aggregate(
        zip_with(qCol, typedLit(cv.toSeq), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
      struct(d.as("d"), lit(ci.toLong).as("c"))
    }
    if (scored.length == 1) scored.head else least(scored.toIndexedSeq: _*)
  }

  private val cents: Array[Array[Long]] = Array(
    Array(0L, 0L, 0L),
    Array(1000000L, -500000L, 250000L),
    Array(1000000L, -500000L, 250000L), // exact duplicate: tie -> lower id
    Array(-2000000L, 3000000L, -1000000L))

  test("kernel equals the composed least(struct) chain on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)(Seq.fill(3)(rnd.nextLong() % 4000000L)).map(Tuple1(_))
    val df = rows.toDF("q")
    val got = df.select(
      native(cents, col("q")).as("n"), composed(cents, col("q")).as("c")).collect()
    got.foreach { r =>
      assert(r.getStruct(0) == r.getStruct(1), s"kernel ${r.getStruct(0)} != composed ${r.getStruct(1)}")
    }
  }

  test("tie on distance breaks to the lowest centroid id") {
    val df = Seq(Tuple1(Seq(1000000L, -500000L, 250000L))).toDF("q")
    val r = df.select(native(cents, col("q")).as("s")).select(col("s.d"), col("s.c")).first()
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L) // matches cent 1 and 2; 1 wins
  }

  test("null array, null element, and length mismatch match the composed chain") {
    // null array -> every distance null -> struct(null, 0) under nulls-first ordering
    val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[Long]])).toDF("q")
    val badElem = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L))).toDF("q")
    val shortArr = Seq(Tuple1(Seq(1L, 2L))).toDF("q")
    for (df <- Seq(nullArr, badElem, shortArr)) {
      val both = df.select(
        native(cents, col("q")).as("n"), composed(cents, col("q")).as("c")).first()
      assert(both.getStruct(0) == both.getStruct(1),
        s"corner diverged: kernel ${both.getStruct(0)} vs composed ${both.getStruct(1)}")
      assert(both.getStruct(0).isNullAt(0) && both.getStruct(0).getLong(1) == 0L)
    }
  }

  test("single-centroid form matches (composed special-cases k = 1)") {
    val one = Array(Array(5L, 5L, 5L))
    val df = Seq(Tuple1(Seq(6L, 4L, 5L))).toDF("q")
    val r = df.select(native(one, col("q")).as("n"), composed(one, col("q")).as("c")).first()
    assert(r.getStruct(0) == r.getStruct(1))
    assert(r.getStruct(0).getLong(0) == 2L)
  }

  test("long overflow fails loudly in both forms (ANSI contract, never a silent wrap)") {
    val big = Array(Array(Long.MaxValue / 2, 0L), Array(0L, 0L))
    val df = Seq(Tuple1(Seq(-Long.MaxValue / 2, 1L))).toDF("q")
    // composed: SparkArithmeticException (ANSI); kernel: ArithmeticException
    // via Math.*Exact — different wrappers, same loud failure
    intercept[Exception](df.select(composed(big, col("q")).as("c")).collect())
    intercept[Exception](df.select(native(big, col("q")).as("n")).collect())
  }

  test("ragged codebooks are rejected at construction (out of contract)") {
    // on a ragged codebook the kernel's mismatch short-circuit could mask
    // a later centroid's ANSI overflow that the composed chain would
    // throw on — the contract requires rectangular codebooks instead
    intercept[IllegalArgumentException] {
      ArgminQuantizedL2(ColumnShim.expression(col("q")),
        Array(Array(1L, 2L, 3L), Array(1L, 2L)))
    }
  }

  test("large in-range values match exactly near the overflow boundary") {
    val big = Array(Array(1000000000L, -1000000000L), Array(0L, 0L))
    val df = Seq(Tuple1(Seq(-1000000000L, 1000000000L))).toDF("q")
    val r = df.select(native(big, col("q")).as("n"), composed(big, col("q")).as("c")).first()
    assert(r.getStruct(0) == r.getStruct(1))
  }
}
