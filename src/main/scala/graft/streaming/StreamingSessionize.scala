package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming sessionization: the batch gap-split of
  * [[graft.operators.EventOps.sessionize]] re-expressed as per-user keyed
  * state over an unbounded event stream, plus a watermarked windowed
  * aggregation over the same stream.
  *
  * State per user is two longs (last event time, session counter) —
  * constant-size regardless of stream length, so this holds at any user
  * count the state store can hash-partition. Session ids match the batch
  * operator (dense per user, 0-based) when each user's events arrive
  * in-order across micro-batches (the standard device-stream assumption;
  * rows inside one micro-batch are sorted before the scan).
  */
object StreamingSessionize {

  final case class Ev(userId: Long, eventId: Long, tUs: Long)
  final case class SessState(lastTs: Long, sessionId: Long)
  final case class SessionizedEvent(event_id: Long, user_id: Long, session_id: Long, t_us: Long)

  /** @param events streaming DataFrame with (event_id, user_id, ts timestamp)
    * @return append-mode stream assigning each event its session id
    */
  def assign(events: DataFrame, gapMinutes: Double = 30.0): Dataset[SessionizedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = (gapMinutes * 60e6).toLong

    events.select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("t_us"))
      .as[(Long, Long, Long)]
      .map { case (u, e, t) => Ev(u, e, t) }
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, batch: Iterator[Ev], state: GroupState[SessState]) => {
          var cur = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionizedEvent]
          for (e <- batch.toSeq.sortBy(ev => (ev.tUs, ev.eventId))) {
            cur =
              if (cur == null) SessState(e.tUs, 0L)
              else if (e.tUs - cur.lastTs > gapUs) SessState(e.tUs, cur.sessionId + 1)
              else SessState(e.tUs, cur.sessionId)
            out += SessionizedEvent(e.eventId, userId, cur.sessionId, e.tUs)
          }
          if (cur != null) state.update(cur)
          out.iterator
        })
  }

  /** Watermarked tumbling-window event counts per (user, event_type):
    * the canonical streaming aggregation shape — late data beyond the
    * watermark is dropped, window state is purged as the watermark
    * passes, results append once windows finalize.
    */
  def windowedCounts(events: DataFrame, windowMinutes: Int = 60,
                     watermarkMinutes: Int = 120): DataFrame =
    events
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .groupBy(
        window(col("ts"), s"$windowMinutes minutes").as("w"),
        col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("event_type"), col("n_events"))
}
