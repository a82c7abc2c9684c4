package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: the ingestion-time twin of
  * [[graft.operators.Dedup.exact]] — emit each document the first time
  * its content hash is seen, drop every later copy, with state expiring
  * after a configurable idle horizon so the store stays bounded.
  *
  * Scale shape: the stream is keyed by the 60-bit portable content hash
  * ([[graft.functions.PortableHash]]), so the state store hash-partitions
  * the seen-set across executors; per-key state is two longs (first-seen
  * doc id, last-seen event time). Processing-time timeout bounds the
  * store at (ingest rate × horizon) keys — the standard tradeoff that a
  * duplicate arriving after the horizon re-emits, exactly like Spark's
  * own `dropDuplicatesWithinWatermark`. The difference from the built-in:
  * the emitted row carries `first_doc_id` and a per-key duplicate count
  * at emission time, which downstream lineage audits need, and the key is
  * the engine-portable hash rather than the raw text (8 bytes of state
  * key per document at any document size).
  */
object StreamingDedup {

  final case class Doc(h: Long, docId: Long)
  final case class SeenState(firstDocId: Long, nDups: Long)
  final case class Emitted(doc_id: Long, text_hash: Long, is_first: Boolean, first_doc_id: Long)

  /** @param docs streaming DataFrame with (doc_id, text)
    * @param idleHorizonMinutes processing-time horizon after which a
    *        content hash is forgotten (0 disables expiry — unbounded
    *        state, only for tests/small corpora)
    * @param emitDuplicates when false (the dedup use), only first
    *        occurrences are emitted; when true, duplicates pass through
    *        flagged `is_first = false` (the audit use)
    * @return append-mode stream of first-seen documents
    */
  def dedup(docs: DataFrame, idleHorizonMinutes: Long = 24 * 60,
            emitDuplicates: Boolean = false): Dataset[Emitted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout =
      if (idleHorizonMinutes > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    docs.select(graft.functions.PortableHash.h60(col("text")).as("h"),
        col("doc_id").cast("long"))
      .as[(Long, Long)]
      .map { case (h, id) => Doc(h, id) }
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        (h: Long, batch: Iterator[Doc], state: GroupState[SeenState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[Emitted]
            var cur = state.getOption.orNull
            // deterministic order inside a micro-batch: smallest id is
            // "first", matching the batch operator's min(doc_id) keeper
            for (d <- batch.toSeq.sortBy(_.docId)) {
              if (cur == null) {
                cur = SeenState(d.docId, 0L)
                out += Emitted(d.docId, h, is_first = true, d.docId)
              } else {
                cur = cur.copy(nDups = cur.nDups + 1)
                if (emitDuplicates) out += Emitted(d.docId, h, is_first = false, cur.firstDocId)
              }
            }
            if (cur != null) {
              state.update(cur)
              if (idleHorizonMinutes > 0)
                state.setTimeoutDuration(s"$idleHorizonMinutes minutes")
            }
            out.iterator
          }
        })
  }
}
