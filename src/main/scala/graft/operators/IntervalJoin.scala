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
    * @param bandMinutes when set, execute as a time-banded equi-join
    *        (see [[bandedCandidates]]) instead of a per-user join with a
    *        range post-filter. Same results, different scale envelope:
    *        the per-user form is quadratic in a user's interval count
    *        (fine when users are small, degenerate under skew); the
    *        banded form is quadratic only in the intervals *touching one
    *        band*, which the band width tunes. Pick a band a few times
    *        the typical interval length.
    * @return left ids with matched right id + ratio (best match per left row)
    */
  def bestOverlapMatch(left: DataFrame, right: DataFrame, minOverlapRatio: Double = 0.0,
                       idCol: String = "id", bandMinutes: Option[Double] = None): DataFrame = {
    val l = left.select(col(idCol).as("left_id"), col("user_id"),
      col("started_at").as("_ls"), col("finished_at").as("_lf"))
    val r = right.select(col(idCol).as("right_id"), col("user_id"),
      col("started_at").as("_rs"), col("finished_at").as("_rf"))

    val candidates = bandMinutes match {
      case Some(mins) => bandedCandidates(l, r, (mins * 60e6).toLong)
      case None =>
        l.join(r, Seq("user_id"))
          .filter(col("_rs") < col("_lf") && col("_ls") < col("_rf")) // overlap range predicate
    }

    val joined = candidates
      .withColumn("overlap_ratio",
        TimeFunctions.overlapRatio(col("_ls"), col("_lf"), col("_rs"), col("_rf")))
      .filter(col("overlap_ratio") >= minOverlapRatio)

    val w = Window.partitionBy("left_id").orderBy(col("overlap_ratio").desc, col("right_id"))
    joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("left_id"), col("user_id"), col("right_id"), col("overlap_ratio"))
  }

  /** Overlapping (left, right) candidate pairs via fixed time bands: each
    * interval explodes to the bands it touches, the join runs as a plain
    * equi-join on (user_id, band), and each pair is kept exactly once —
    * on the first band the two intervals share (`band ==
    * max(first_left_band, first_right_band)`), so no distinct pass is
    * needed. Two intervals overlap iff their band ranges intersect, so
    * the equi-join finds every overlapping pair; the range predicate
    * then removes same-band non-overlaps. The band end is `end - 1µs`
    * (`greatest(start, ...)` guards zero-length intervals) because the
    * overlap predicate is strict: an interval touching a band boundary
    * exactly does not reach into the next band.
    */
  private def bandedCandidates(l: DataFrame, r: DataFrame, bandUs: Long): DataFrame = {
    require(bandUs > 0, "bandMinutes must be positive")
    def bands(s: String, f: String, first: String) = Seq(
      floor(unix_micros(col(s)) / bandUs).as(first),
      explode(sequence(
        floor(unix_micros(col(s)) / bandUs),
        floor(greatest(unix_micros(col(f)) - 1, unix_micros(col(s))) / bandUs))).as("_band"))
    val lb = l.select(col("left_id") +: col("user_id") +: col("_ls") +: col("_lf") +:
      bands("_ls", "_lf", "_lb0"): _*)
    val rb = r.select(col("right_id") +: col("user_id") +: col("_rs") +: col("_rf") +:
      bands("_rs", "_rf", "_rb0"): _*)
    lb.join(rb, Seq("user_id", "_band"))
      .filter(col("_band") === greatest(col("_lb0"), col("_rb0")))
      .filter(col("_rs") < col("_lf") && col("_ls") < col("_rf"))
      .drop("_band", "_lb0", "_rb0")
  }
}
