package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of (point-in-time) enrichment: each event picks up the
  * LATEST same-user label at-or-before its event time — the feature-
  * store primitive behind leakage-free training joins
  * (/root/reference/trackintel's join sites express the batch form;
  * [[graft.operators.AsOfJoin]] is this repo's batch twin), expressed
  * as per-user keyed state over a single tagged input stream.
  *
  * Native stream-stream joins cannot express "latest ≤ ts" (their
  * conditions are symmetric range predicates, and a MAX-per-probe is
  * not a join predicate), so this is the keyed-state shape: labels and
  * events arrive on ONE stream tagged by kind (the standard multi-input
  * pattern for [[Dataset.flatMapGroupsWithState]]), and the state per
  * user is exactly ONE (label_t, label_id) pair — constant-size
  * regardless of stream length or label volume, strictly smaller state
  * than the interval join's watermark horizon. An event emits
  * immediately with the state's label (or nulls before the first
  * label): at-or-before semantics need no watermark wait, because under
  * the in-order-per-user device-stream assumption (the same contract as
  * [[StreamingSessionize]]) no future row can change "the latest label
  * ≤ t" once t has been read.
  *
  * Tie rules match the batch [[graft.operators.AsOfJoin]] contract: a
  * label AT the event's own time counts (≤, not <), and among several
  * labels at one (user, t) the max label id wins. Rows inside one
  * micro-batch are sorted (t, labels-before-events, id) before the
  * state scan, so the rules hold regardless of how a batch interleaves.
  */
object StreamingAsOf {

  final case class In(userId: Long, isLabel: Boolean, id: Long, tUs: Long)
  final case class LabelState(tUs: Long, id: Long)
  final case class Enriched(event_id: Long, user_id: Long, t_us: Long,
                            label_id: java.lang.Long, label_t_us: java.lang.Long)

  /** @param tagged streaming (user_id, is_label, id, t_us) — one row per
    *               label or event, in-order per user across batches
    * @return append stream: one row per event, with the latest
    *         at-or-before label (null columns before a user's first)
    */
  def enrich(tagged: DataFrame): Dataset[Enriched] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged.select(col("user_id").cast("long"), col("is_label").cast("boolean"),
        col("id").cast("long"), col("t_us").cast("long"))
      .as[(Long, Boolean, Long, Long)]
      .map { case (u, l, i, t) => In(u, l, i, t) }
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (userId: Long, batch: Iterator[In], state: GroupState[LabelState]) => {
          var cur = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Enriched]
          // labels sort before events at the same t (false < true on
          // !isLabel), and id-ascending order makes the max-id label at
          // one t the last applied
          for (r <- batch.toSeq.sortBy(r => (r.tUs, !r.isLabel, r.id))) {
            if (r.isLabel) {
              if (cur == null || r.tUs > cur.tUs || (r.tUs == cur.tUs && r.id > cur.id))
                cur = LabelState(r.tUs, r.id)
            } else {
              // future-label guard: under the in-order contract
              // cur.tUs <= r.tUs always holds (the in-order replay and
              // the oracle never see this branch), but if the stream
              // DISORDERS — a late event arriving after the label
              // timeline has advanced past it — the single-pair state
              // can no longer answer "latest at-or-before". Enriching
              // with the future label would be exactly the feature
              // leakage point-in-time joins exist to prevent, so the
              // event emits null-enriched instead: absent features,
              // never leaked ones.
              out += (if (cur == null || cur.tUs > r.tUs)
                        Enriched(r.id, userId, r.tUs, null, null)
                      else Enriched(r.id, userId, r.tUs, cur.id, cur.tUs))
            }
          }
          if (cur != null) state.update(cur)
          out.iterator
        })
  }
}
