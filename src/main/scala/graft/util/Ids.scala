package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense sequential id assignment (0..n-1) in a given total order.
  *
  * The reference assigns entity ids positionally after a (user, time) sort
  * (preprocessing/positionfixes.py:163-164). A Spark `row_number()` over a
  * global window would force everything through one partition, so the id
  * is computed in two distributed levels instead:
  *
  *   1. per-group rank: `row_number()` partitioned by the leading order
  *      column (user_id at every call site — the same key the surrounding
  *      operators already shuffle on, so the exchange is reused);
  *   2. group offset: per-group counts cumulated in leading-column order
  *      — a tiny one-row-per-group table, broadcast back.
  *
  * id = offset(group) + rank - 1. No RDD round-trip, no global sort, no
  * extra job; stays inside whole-stage codegen. The cumsum window over
  * the per-group table is single-partition, but it carries one row per
  * group (users), orders of magnitude smaller than the data.
  */
object Ids {

  def withSequentialId(df: DataFrame, idCol: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    val part = order.head
    val rank = row_number().over(Window.partitionBy(part).orderBy(order.tail :+ monotonically_increasing_id(): _*))

    val groupKey = "_ids_grp"
    val counts = df.groupBy(part.as(groupKey)).agg(count(lit(1)).as("_ids_n"))
    val offsets = counts
      .withColumn("_ids_off",
        coalesce(sum(col("_ids_n")).over(
          Window.orderBy(groupKey).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_ids_n")

    df.withColumn("_ids_rank", rank)
      .join(broadcast(offsets), part === col(groupKey))
      .withColumn(idCol, col("_ids_off") + col("_ids_rank") - 1)
      .drop(groupKey, "_ids_rank", "_ids_off")
  }
}
