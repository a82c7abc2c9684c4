package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate candidate detection: the ingestion-time twin
  * of [[graft.operators.Dedup.minHashLsh]]'s banding stage. Each arriving
  * document computes its MinHash band signatures in the scan stage (the
  * same codegen kernel as batch), and every (band, hash) bucket keeps the
  * ids seen there — a new arrival that lands in a non-empty bucket emits
  * candidate pairs against the bucket's residents.
  *
  * Scale shape: state is keyed by the packed band key, so the bucket
  * store hash-partitions across executors like any keyed state. Per-key
  * state is a bounded id list: `maxBucketSize` caps resident ids (the
  * streaming form of the batch SimHash hot-bucket guard — a degenerate
  * bucket stops *absorbing* new residents but keeps pairing new arrivals
  * against the capped set, so per-arrival output stays bounded), and a
  * processing-time timeout expires idle buckets, bounding the store at
  * (ingest rate × horizon) × bands keys of ≤ maxBucketSize longs.
  *
  * Emissions are candidates, not verified pairs: near-identical documents
  * collide in many bands, so the same (id_a, id_b) can be emitted once
  * per colliding band. Downstream consumers dedup on (id_a, id_b) and
  * verify jaccard exactly as the batch pipeline does with its pair
  * table — carrying shingle sets through the state store would multiply
  * state size by document length for a check that is one equi-join in
  * the verification batch.
  */
object StreamingNearDup {

  final case class Arrival(key: Long, docId: Long)
  final case class BucketState(ids: List[Long], saturated: Boolean)
  final case class Candidate(id_a: Long, id_b: Long, band: Int)

  /** Pack (band index, band hash) into the single long state key: the
    * band hash occupies the low bits (MinHashBands emits 60-bit values),
    * the band index the top 4 — band counts beyond 16 fold into the
    * hash's entropy via XOR, which only merges buckets (more candidates,
    * never fewer).
    */
  private[streaming] def packKey(band: Int, hash: Long): Long =
    (band.toLong << 60) ^ (hash & ((1L << 60) - 1))

  /** @param docs streaming (doc_id, text)
    * @param idleHorizonMinutes processing-time horizon after which a
    *        bucket is forgotten (0 disables expiry — tests only)
    * @param maxBucketSize resident-id cap per bucket
    * @return append-mode stream of candidate pairs (id_a < id_b, with
    *         the colliding band; one row per colliding band)
    */
  def candidates(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                 shingleN: Int = 3, idleHorizonMinutes: Long = 24 * 60,
                 maxBucketSize: Int = 64): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftshim.ColumnShim
    require(numHashes % bands == 0, "bands must divide numHashes")
    val timeout =
      if (idleHorizonMinutes > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    val bandHashes = ColumnShim.column(graft.plans.MinHashBands(
      ColumnShim.expression(graft.operators.Dedup.shingles(col("text"), shingleN)),
      numHashes, bands))

    docs.select(col("doc_id").cast("long").as("docId"),
        posexplode(bandHashes).as(Seq("band", "h")))
      .select((shiftleft(col("band").cast("long"), 60)
        .bitwiseXOR(col("h").bitwiseAND(lit((1L << 60) - 1)))).as("key"), col("docId"))
      .as[Arrival]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        (key: Long, batch: Iterator[Arrival], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val band = (key >>> 60).toInt
            val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]
            var cur = state.getOption.getOrElse(BucketState(Nil, saturated = false))
            // deterministic order inside a micro-batch (same rule as
            // StreamingDedup): residents accumulate smallest-id first
            for (a <- batch.toSeq.sortBy(_.docId)) {
              for (res <- cur.ids if res != a.docId)
                out += Candidate(math.min(res, a.docId), math.max(res, a.docId), band)
              if (!cur.saturated) {
                if (cur.ids.length < maxBucketSize) cur = cur.copy(ids = a.docId :: cur.ids)
                else cur = cur.copy(saturated = true)
              }
            }
            state.update(cur)
            if (idleHorizonMinutes > 0)
              state.setTimeoutDuration(s"$idleHorizonMinutes minutes")
            out.iterator
          }
        })
  }
}
