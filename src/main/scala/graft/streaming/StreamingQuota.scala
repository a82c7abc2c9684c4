package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-group ingest quotas: admit at most `quota` documents per
  * group (language, source, tenant) per tumbling window, drop — or flag —
  * the overflow. The ingestion-time twin of a batch per-group `LIMIT`:
  * real pipelines cap what any one source can contribute per hour so a
  * misbehaving crawler cannot flood the training mix between curation
  * runs.
  *
  * Scale shape: the stream keys by group, so quota state hash-partitions
  * across executors; per-key state is two longs (current window start,
  * admitted count) — constant size regardless of traffic. Admission is
  * deterministic given arrival order (first-come-first-admitted inside a
  * micro-batch, ordered by event time then doc id, so a replayed batch
  * admits the same set). Windows are event-time aligned (floor to the
  * window length), state resets lazily when a later window's first row
  * arrives, and a processing-time timeout clears groups that go silent.
  */
object StreamingQuota {

  final case class In(group: String, docId: Long, tUs: Long)
  final case class QuotaState(windowStartUs: Long, admitted: Long)
  final case class Admitted(group: String, doc_id: Long, window_start_us: Long,
                            seq_in_window: Long, admitted: Boolean)

  /** @param docs streaming frame with (group, doc_id, event_time cols)
    * @param quota max admissions per group per window
    * @param windowMinutes tumbling event-time window length
    * @param emitRejected when true, overflow rows pass through flagged
    *        `admitted = false` (the audit shape); when false they drop
    * @param idleHorizonMinutes processing-time horizon after which a
    *        silent group's state is forgotten (0 = never, tests only)
    */
  def quota(docs: DataFrame, quota: Long, windowMinutes: Long,
            groupCol: String = "lang", idCol: String = "doc_id", timeCol: String = "t_us",
            emitRejected: Boolean = false,
            idleHorizonMinutes: Long = 24 * 60): Dataset[Admitted] = {
    require(quota > 0, "quota must be positive")
    require(windowMinutes > 0, "windowMinutes must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val windowUs = windowMinutes * 60L * 1000000L
    val timeout =
      if (idleHorizonMinutes > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    docs.select(col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("docId"), col(timeCol).cast("long").as("tUs"))
      .as[In]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        (group: String, batch: Iterator[In], state: GroupState[QuotaState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
            var cur = state.getOption.getOrElse(QuotaState(Long.MinValue, 0L))
            // deterministic admission inside a micro-batch: event time,
            // then id — a replayed batch admits the same documents
            batch.toArray.sortBy(r => (r.tUs, r.docId)).foreach { r =>
              val winStart = Math.floorDiv(r.tUs, windowUs) * windowUs
              if (winStart > cur.windowStartUs) cur = QuotaState(winStart, 0L)
              // late rows of an already-passed window count against the
              // CURRENT window's budget rather than resurrecting closed
              // state (bounded state beats perfect lateness accounting;
              // a watermark upstream should drop the truly ancient)
              val ok = cur.admitted < quota
              if (ok) cur = cur.copy(admitted = cur.admitted + 1)
              if (ok || emitRejected)
                out += Admitted(group, r.docId, cur.windowStartUs,
                  if (ok) cur.admitted else -1L, ok)
            }
            state.update(cur)
            if (idleHorizonMinutes > 0)
              state.setTimeoutDuration(s"$idleHorizonMinutes minutes")
            out.iterator
          }
        })
  }

  /** Batch twin: same admission rule (event time, then id, first `quota`
    * per (group, window)) — the parity target for specs and the backfill
    * path. Parity with the streaming path holds for event-time-ordered
    * (equivalently, watermarked) input: on OUT-OF-ORDER data the two
    * diverge by design — streaming counts a late row of an already-passed
    * window against the current window's budget and stamps it with the
    * current `window_start_us` (bounded state), while batch assigns every
    * row to its true window. StreamingQuotaSpec pins the divergence.
    */
  def quotaBatch(docs: DataFrame, quotaN: Long, windowMinutes: Long,
                 groupCol: String = "lang", idCol: String = "doc_id",
                 timeCol: String = "t_us"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val windowUs = windowMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("group"), col("window_start_us"))
      .orderBy(col("_t"), col("doc_id"))
    docs.select(col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("doc_id"), col(timeCol).cast("long").as("_t"))
      // integer window start: t - pmod(t, w) == floorDiv(t, w) * w for ALL
      // longs (incl. negatives) — the double-division form is only exact
      // while t fits double's 2^53 integer range
      .withColumn("window_start_us",
        (col("_t") - pmod(col("_t"), lit(windowUs))).cast("long"))
      .withColumn("seq_in_window", row_number().over(w).cast("long"))
      .filter(col("seq_in_window") <= quotaN)
      .select(col("group"), col("doc_id"), col("window_start_us"), col("seq_in_window"),
        lit(true).as("admitted"))
  }
}
