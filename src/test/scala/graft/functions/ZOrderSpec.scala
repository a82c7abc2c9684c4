package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** bit-by-bit reference interleave. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until ZOrder.Bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
    }

  test("interleave matches the bit-by-bit reference on edge and random values") {
    val samples = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (ZOrder.Max, ZOrder.Max),
      (ZOrder.Max, 0L), (123456L, 654321L), (1048575L, 1L), (2096127L, 99L))
    val got = samples.toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z")).as[Long].collect()
    val want = samples.map { case (x, y) => mortonRef(x & ZOrder.Max, y & ZOrder.Max) }
    assert(got.toSeq == want)
    assert(mortonRef(ZOrder.Max, ZOrder.Max) == (1L << 42) - 1) // full 42-bit range
  }

  test("morton order walks the z-curve on a 4x4 grid") {
    val cells = for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y)
    val ordered = cells.toDF("x", "y")
      .withColumn("z", ZOrder.interleave(col("x"), col("y")))
      .orderBy("z").select("x", "y").as[(Long, Long)].collect().toSeq
    // the canonical 2D z-curve visit order
    val expect = Seq((0L,0L),(1L,0L),(0L,1L),(1L,1L),(2L,0L),(3L,0L),(2L,1L),(3L,1L),
      (0L,2L),(1L,2L),(0L,3L),(1L,3L),(2L,2L),(3L,2L),(2L,3L),(3L,3L))
    assert(ordered == expect)
  }

  test("clusterByZOrder plans a range repartition + within-partition sort") {
    val df = (0 until 100).map(i => (i.toLong % 10, i.toLong / 10)).toDF("x", "y")
    val plan = ZOrder.clusterByZOrder(df, col("x"), col("y"), numPartitions = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert("(?i)sort".r.findFirstIn(plan).isDefined, plan)
  }
}
