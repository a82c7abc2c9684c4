package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval enrichment: label each event with the label
  * intervals of the same user that contain its event time — the
  * streaming form of [[graft.operators.IntervalJoin]]'s containment
  * case, as a native watermarked stream-stream join (no keyed-state
  * custom operator needed; Catalyst's streaming symmetric hash join is
  * the right machinery).
  *
  * State boundedness: a containment predicate alone (`ts < finished_at`)
  * bounds the watermark pair in one direction only, which would leave
  * one side's join state growing with stream length. Declaring a
  * maximum interval duration closes the other direction
  * (`ts >= finished_at - maxDuration`), so both inputs' state is purged
  * as watermarks advance — state is watermark-horizon × arrival-rate,
  * independent of how long the streams run. The duration cap is a
  * contract on the label stream, asserted nowhere else, so it is an
  * explicit parameter rather than a default.
  */
object StreamingIntervalJoin {

  /** @param events streaming (event_id, user_id, ts timestamp)
    * @param labels streaming (label_id, user_id, label,
    *               started_at/finished_at timestamps), each interval no
    *               longer than `maxDurationMinutes`
    * @return append stream (event_id, user_id, ts, label_id, label);
    *         events land once per containing interval
    */
  def enrich(events: DataFrame, labels: DataFrame,
             maxDurationMinutes: Int, watermarkMinutes: Int = 60): DataFrame = {
    val l = events
      .select(col("event_id"), col("user_id").as("_lu"), col("ts"))
      .withWatermark("ts", s"$watermarkMinutes minutes")
    val r = labels
      .select(col("label_id"), col("user_id").as("_ru"), col("label"),
        col("started_at"), col("finished_at"))
      .withWatermark("finished_at", s"$watermarkMinutes minutes")
    // `ts >= started_at` must stay OUT of the join condition:
    // started_at carries no watermark, so StreamingJoinHelper logs an
    // INTERNAL_ERROR stack per batch trying to derive a state bound
    // from it (benign — the two finished_at conjuncts already bound
    // both sides' state — but it buries the log). A deterministic
    // post-join filter gets folded straight back into the condition by
    // PushPredicateThroughJoin; marking the comparison
    // non-deterministic is the documented optimizer barrier (same
    // treatment as StreamingColocation's pair-ordering conjunct, r10).
    val startedBefore = udf((t: java.sql.Timestamp, s: java.sql.Timestamp) =>
      t != null && s != null && !t.before(s)).asNondeterministic()
    l.join(r,
        col("_lu") === col("_ru") &&
          col("ts") < col("finished_at") &&
          col("ts") >= col("finished_at") - expr(s"INTERVAL $maxDurationMinutes MINUTES"))
      .filter(startedBefore(col("ts"), col("started_at")))
      .select(col("event_id"), col("_lu").as("user_id"), col("ts"),
        col("label_id"), col("label"))
  }
}
