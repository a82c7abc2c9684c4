package graft.operators

import graft.functions.TimeFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal interval joins — the pattern behind the reference's geolife
  * mode-label matching (io/dataset_reader.py:197-366): for each left
  * interval, find the right-side interval of the same user with the
  * highest overlap ratio.
  *
  * The reference prefilters with a kNN over (start, end) epochs and then
  * computes overlap ratios; here the prefilter is the join condition
  * itself — a per-user range predicate `r.start < l.end && l.start <
  * r.end` that Spark executes as a broadcast/shuffle hash join on
  * user_id with the range condition applied as a post-filter (and AQE
  * free to pick the side). A top-1 ranking window picks the best label.
  */
object IntervalJoin {

  /** @param left  (idCol, user_id, started_at, finished_at, …)
    * @param right (idCol, user_id, started_at, finished_at, …) — labels
    * @param minOverlapRatio keep only matches covering at least this
    *        share of the left interval (reference threshold semantics)
    * @return left ids with matched right id + ratio (best match per left row)
    */
  def bestOverlapMatch(left: DataFrame, right: DataFrame, minOverlapRatio: Double = 0.0,
                       idCol: String = "id"): DataFrame = {
    val l = left.select(col(idCol).as("left_id"), col("user_id"),
      col("started_at").as("_ls"), col("finished_at").as("_lf"))
    val r = right.select(col(idCol).as("right_id"), col("user_id"),
      col("started_at").as("_rs"), col("finished_at").as("_rf"))

    val joined = l.join(r, Seq("user_id"))
      .filter(col("_rs") < col("_lf") && col("_ls") < col("_rf")) // overlap range predicate
      .withColumn("overlap_ratio",
        TimeFunctions.overlapRatio(col("_ls"), col("_lf"), col("_rs"), col("_rf")))
      .filter(col("overlap_ratio") >= minOverlapRatio)

    val w = Window.partitionBy("left_id").orderBy(col("overlap_ratio").desc, col("right_id"))
    joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("left_id"), col("user_id"), col("right_id"), col("overlap_ratio"))
  }
}
