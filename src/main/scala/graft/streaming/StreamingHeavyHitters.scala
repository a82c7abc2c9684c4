package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming per-window heavy hitters over the NATIVE Structured
  * Streaming aggregation path: watermarked tumbling-window counts in
  * append mode. Every other streaming operator in this package manages
  * its own keyed state (`flatMapGroupsWithState`, symmetric joins);
  * this one deliberately certifies the engine-managed path instead —
  * `withWatermark` + `groupBy(window(...))` + append output, where
  * Spark's state store holds the running counts and a window's counts
  * are emitted EXACTLY ONCE, as finals, when the watermark passes the
  * window end. That finalize-on-watermark semantics (and its flip side:
  * rows later than the delay are dropped, bounding state) is the core
  * production contract of streaming aggregation, and it was previously
  * uncovered by the gate registry.
  *
  * Scale shape: state is one count per (window, key) hash-partitioned
  * by the engine across executors, evicted at watermark — constant per
  * key, no custom code in the hot path, whole-stage codegen on the
  * partial aggregates. The top-k rank is a bounded batch epilogue over
  * the FINALIZED counts (per window, k rows survive), not a streaming
  * stage: rank needs the closed window by definition, so it belongs
  * after the watermark boundary — e.g. in the foreachBatch sink or a
  * downstream reader, exactly where [[Replay.heavyHitters]] puts it.
  */
object StreamingHeavyHitters {

  /** The streaming half: finalized (window_start_us, key, n) counts.
    * Append mode only emits windows the watermark has closed.
    */
  def windowCounts(events: DataFrame, windowMinutes: Long, delayMinutes: Long,
                   keyCol: String = "event_type", timeCol: String = "t_us"): DataFrame = {
    require(windowMinutes > 0 && delayMinutes >= 0, "window/delay must be sensible")
    events
      .withColumn("_ts", timestamp_micros(col(timeCol).cast("long")))
      .withWatermark("_ts", s"$delayMinutes minutes")
      .groupBy(window(col("_ts"), s"$windowMinutes minutes"),
        col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"), col("key"), col("n"))
  }

  /** The batch epilogue: exact top-k per closed window, deterministic
    * total order (count desc, key asc).
    */
  def topK(finalCounts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = Window.partitionBy(col("window_start_us")).orderBy(col("n").desc, col("key"))
    finalCounts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("window_start_us", "key", "n", "rank")
  }
}
