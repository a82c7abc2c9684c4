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
    val (l, r) = watermarked(events, labels, watermarkMinutes)
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
    l.join(r, stateBoundCond(maxDurationMinutes))
      .filter(startedBefore(col("ts"), col("started_at")))
      .select(col("event_id"), col("_lu").as("user_id"), col("ts"),
        col("label_id"), col("label"))
  }

  /** The LEFT OUTER twin of [[enrich]]: events with no same-user
    * containing interval null-extend EXACTLY ONCE, emitted when the
    * watermark proves no future label can still match (the canonical
    * outer-join-with-state-eviction semantics of the streaming
    * symmetric hash join; an event's unmatched row lands only after the
    * global watermark passes `ts + maxDuration`, so late labels can
    * never contradict an already-emitted null row).
    *
    * Unlike the inner path, `ts >= started_at` here must live IN the
    * join condition: a post-join filter would turn a
    * coarse-matched-but-refinement-failed pair into a dropped row
    * instead of a null-extension, silently losing the event from the
    * output. The conjunct references the un-watermarked `started_at`,
    * which StreamingJoinHelper cannot derive a state bound from — that
    * is fine (the two `finished_at` conjuncts already bound both
    * sides' state) but logs a per-batch INTERNAL_ERROR stack, so this
    * object turns that one logger off at class-load (see
    * [[silenceJoinHelper]]).
    */
  def enrichLeftOuter(events: DataFrame, labels: DataFrame,
                      maxDurationMinutes: Int, watermarkMinutes: Int = 60): DataFrame = {
    silenceJoinHelper
    val (l, r) = watermarked(events, labels, watermarkMinutes)
    l.join(r, stateBoundCond(maxDurationMinutes) && col("ts") >= col("started_at"),
        "leftOuter")
      .select(col("event_id"), col("_lu").as("user_id"), col("ts"),
        col("label_id"), col("label"))
  }

  private def watermarked(events: DataFrame, labels: DataFrame,
                          watermarkMinutes: Int): (DataFrame, DataFrame) = (
    events
      .select(col("event_id"), col("user_id").as("_lu"), col("ts"))
      .withWatermark("ts", s"$watermarkMinutes minutes"),
    labels
      .select(col("label_id"), col("user_id").as("_ru"), col("label"),
        col("started_at"), col("finished_at"))
      .withWatermark("finished_at", s"$watermarkMinutes minutes"))

  /** The two watermark-derivable conjuncts that bound BOTH sides' state
    * (events evict once the label watermark passes `ts + maxDuration`,
    * labels once the event watermark passes `finished_at`), plus the
    * user equi-key.
    */
  private def stateBoundCond(maxDurationMinutes: Int) =
    col("_lu") === col("_ru") &&
      col("ts") < col("finished_at") &&
      col("ts") >= col("finished_at") - expr(s"INTERVAL $maxDurationMinutes MINUTES")

  /** StreamingJoinHelper ERROR-logs a full INTERNAL_ERROR stack for
    * every conjunct it cannot derive a state watermark from — once per
    * micro-batch — even when other conjuncts already bound the state
    * (its own scaladoc calls the analysis best-effort). The outer path
    * requires such a conjunct in the condition (see
    * [[enrichLeftOuter]]), so the noise is structural, not a defect to
    * fix; turning the single logger off is the narrowest barrier (the
    * helper logs nothing actionable at any level — a genuinely
    * unbounded condition fails the query loudly elsewhere).
    */
  private lazy val silenceJoinHelper: Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.StreamingJoinHelper",
      org.apache.logging.log4j.Level.OFF)
}
