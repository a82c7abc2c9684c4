package graft.streaming

import java.nio.file.Files

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, Dataset, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Deterministic micro-batch replay of the streaming operators over a
  * bounded table — the bridge that makes the streaming package visible
  * to the batch correctness gate (reference has no streaming surface; this
  * is the engine's stream-native extension, SURVEY.md §1.4).
  *
  * The harness feeds the table through a [[MemoryStream]] in K
  * time-ordered micro-batches (global sort by (t, id), then equal row
  * chunks — so each user's rows arrive in-order across batches, the
  * operators' documented device-stream assumption), drains each batch
  * with `processAllAvailable`, and collects every batch's append output
  * into a bounded driver buffer via `foreachBatch` (see [[Collector]] —
  * the earlier per-batch parquet append cost ~0.4-1.0 s of committer
  * round-trip per micro-batch, the largest single cost of every replay
  * gate). The result is bit-deterministic: same input → same chunking →
  * same state transitions → same rows, regardless of chunk count.
  *
  * The driver-side feed is the test-harness half only (MemoryStream data
  * lives on the driver by construction — production replaces it with a
  * Kafka/file source); the operator under replay runs as a genuine
  * Structured Streaming query with hash-partitioned keyed state, so what
  * the gate certifies is the state-transition semantics that production
  * would execute.
  */
object Replay {

  private def tmp(prefix: String): String = {
    // replay checkpoints are harness-temp state (created per call,
    // deleted by Collector.result) — put them on the RAM-backed tmpfs
    // when one exists: every micro-batch pays offset-log + commit-log +
    // per-partition state-store file round-trips, and on a disk-backed
    // java.io.tmpdir that file churn is the largest fixed cost of every
    // replay gate. Production replaces the whole checkpoint location
    // with a durable store; the state-transition semantics certified by
    // the gates are byte-identical either way (oracle-rechecked).
    // Capacity-gated (r15 ADVICE.md): a small tmpfs (Docker's default
    // /dev/shm is 64 MB) can ENOSPC mid-replay on the offset/commit/state
    // files, failing gates that worked on the disk-backed tmpdir. A replay
    // writes a few MB; require comfortable headroom before electing tmpfs,
    // and allow an env opt-out for constrained hosts.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val shmUsable =
      !sys.env.get("SPARK_GRAFT_REPLAY_NO_SHM").exists(_.nonEmpty) &&
        Files.isDirectory(shm) && Files.isWritable(shm) &&
        (try Files.getFileStore(shm).getUsableSpace >= 256L * 1024 * 1024
         catch { case _: java.io.IOException => false })
    if (shmUsable) Files.createTempDirectory(shm, prefix).toString
    else Files.createTempDirectory(prefix).toString
  }

  /** A cloned session the replay's streaming query runs on, pinned to 4
    * shuffle partitions. Replay volumes are bounded (residue-class slices
    * of test tables), but every micro-batch commits one state store PER
    * shuffle partition (×2 sides for stream-stream joins) — at the
    * session's 32 partitions that's pure file-IO overhead, ~2/3 of the
    * colocation gate's wall clock before the pinning. Key-hash state
    * partitioning is semantics-free: same transitions, same rows
    * (ReplaySpec pins chunking/partitioning invariance).
    *
    * A CLONE (not a conf mutate-and-restore on the caller's session,
    * the previous approach) because the streaming plan reads the conf at
    * query start, and any batch query planned concurrently on the shared
    * session during that window would silently inherit 4 shuffle
    * partitions — Verify now runs gates in parallel, making that race
    * real. The clone shares the SparkContext (same executors, same block
    * store) but owns its SQLConf, so the pinning is invisible outside
    * the replay. Only the streaming query runs on the clone; the replay
    * result is read back on the caller's session.
    */
  private def runnerSession(spark: SparkSession, partitions: Int = 2): SparkSession = {
    val s = spark.newSession()
    GraftSession.prepare(s)
    // 2 partitions for the keyed-state replays (every micro-batch
    // commits one state store PER partition — pure file-IO overhead on
    // bounded slices, measured −0.3..−0.6 s per gate vs 4); the
    // pair-emitting stream-stream joins pass a higher count because
    // their per-batch COMPUTE (same-cell pair matching) dominates and
    // parallelizes. Key-hash state partitioning is semantics-free: same
    // transitions, same rows (ReplaySpec pins chunking/partitioning
    // invariance).
    s.conf.set("spark.sql.shuffle.partitions", partitions)
    // replay queries run a handful of micro-batches and the checkpoint
    // dir is deleted right after — retaining the default 100 batches of
    // state/metadata files only adds file churn per commit
    s.conf.set("spark.sql.streaming.minBatchesToRetain", 2)
    s
  }

  /** Feed `rows` in `chunks` equal micro-batches (then any `tail`
    * batches), draining each with processAllAvailable before the next —
    * sequential batches are what makes the keyed-state transitions
    * deterministic.
    */
  private def drain[T](input: MemoryStream[T], rows: Seq[T], chunks: Int,
                       tail: Seq[Seq[T]] = Nil)(start: => StreamingQuery): Unit = {
    val q = start
    try {
      val per = math.max(1, math.ceil(rows.length.toDouble / chunks).toInt)
      (rows.grouped(per) ++ tail.iterator.filter(_.nonEmpty)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  private def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  /** Driver-side append sink for the replay harness: each micro-batch's
    * output rows are collected into a bounded driver buffer instead of
    * appended to a temp parquet — the per-batch parquet committer
    * round-trip measured ~0.4-1.0 s PER MICRO-BATCH even for empty
    * batches, the single largest cost of every replay gate (r14 verdict
    * #6: streaming_interval_join spent ~2 of its ~4 s writing), while
    * gate outputs are residue-class slices bounded in the tens of
    * thousands of rows. The feed half of the harness is driver-side by
    * construction (MemoryStream); the sink half now matches —
    * production replaces both ends with Kafka/file sources and sinks.
    *
    * @note local-mode-only by design, like the feed: the buffer must
    *       fit on the driver, which the bounded replay slices do.
    */
  private final class Collector {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    private var schema: org.apache.spark.sql.types.StructType = _
    def add(df: Dataset[_]): Unit = {
      val d = df.toDF()
      val rows = d.collect()
      synchronized { if (schema == null) schema = d.schema; buf ++= rows }
    }
    /** The accumulated rows as a frame on the CALLER's session, pinned
      * via eager local checkpoint (same lifetime contract the parquet
      * read-back had); also deletes the replay's checkpoint dir.
      */
    def result(spark: SparkSession, ckpt: String, empty: => DataFrame): DataFrame =
      synchronized {
        val out =
          if (schema == null || buf.isEmpty) empty
          else spark.createDataFrame(
            spark.sparkContext.parallelize(buf.toSeq, 4), schema).localCheckpoint(true)
        deleteRecursively(ckpt)
        out
      }
  }

  /** Replay [[StreamingSessionize.assign]] over a bounded event table.
    *
    * @param events (event_id, user_id, t_us) — any extra columns ignored
    * @return (event_id, user_id, session_id) matching the batch
    *         `EventOps.sessionize` contract
    */
  def sessionize(events: DataFrame, gapMinutes: Double = 30.0, chunks: Int = 8): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext

    val rows = events
      .select(col("event_id").cast("long"), col("user_id").cast("long"), col("t_us").cast("long"))
      .as[(Long, Long, Long)].collect()
      .sortBy { case (e, _, t) => (t, e) }.toSeq

    val input = MemoryStream[(Long, Long, Long)]
    val stream = input.toDF().toDF("event_id", "user_id", "t_us")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("t_us")).as("ts"))
    val sink = new Collector
    val ckpt = tmp("graft-replay-sess-ckpt")

    drain(input, rows, chunks) {
      StreamingSessionize.assign(stream, gapMinutes)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingSessionize.SessionizedEvent], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    sink.result(spark, ckpt,
        spark.emptyDataset[StreamingSessionize.SessionizedEvent].toDF())
      .select(col("event_id"), col("user_id"), col("session_id"))
  }

  /** Replay [[StreamingDedup.dedup]] over a bounded document table in
    * audit mode (duplicates pass through flagged): rows arrive in doc-id
    * order, so first-seen matches the batch operator's min(doc_id)
    * keeper; expiry is off so the replay is chunking-deterministic.
    *
    * @param docs (doc_id, text) — extra columns ignored
    * @return (doc_id, text_hash, is_first, first_doc_id)
    */
  def dedup(docs: DataFrame, chunks: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext

    val rows = docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val sink = new Collector
    val ckpt = tmp("graft-replay-dedup-ckpt")

    drain(input, rows, chunks) {
      StreamingDedup.dedup(stream, idleHorizonMinutes = 0L, emitDuplicates = true)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingDedup.Emitted], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    sink.result(spark, ckpt,
        spark.emptyDataset[StreamingDedup.Emitted].toDF())
      .select(col("doc_id"), col("text_hash"), col("is_first"), col("first_doc_id"))
  }

  /** Replay [[StreamingDedup.dedup]] with a deterministic OUT-OF-ORDER
    * feed (micro-batch p carries the docs with doc_id ≡ p mod chunks):
    * the first-seen keeper is no longer the batch twin's global
    * min(doc_id) — it is the smallest id in the EARLIEST batch that
    * carries the hash, i.e. min by (doc_id mod chunks, doc_id). The
    * divergence contract is that closed form (the oracle); audit mode so
    * every duplicate row points at its keeper.
    */
  /** Replay [[StreamingNearDup.candidates]] over a bounded document
    * table: rows arrive in doc-id order (chunk-invariant by the
    * operator's smallest-id-first in-batch rule), expiry off and the
    * bucket cap effectively disabled, so the emitted set has the CLOSED
    * FORM "one row per (pair, band) whose MinHash band hashes collide"
    * — exactly the batch banding CTE without the distinct.
    *
    * @param docs (doc_id, text) — extra columns ignored
    * @return (id_a, id_b, band)
    */
  def nearDup(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
              shingleN: Int = 3, chunks: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext

    val rows = docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val sink = new Collector
    val ckpt = tmp("graft-replay-neardup-ckpt")

    drain(input, rows, chunks) {
      StreamingNearDup.candidates(stream, numHashes, bands, shingleN,
          idleHorizonMinutes = 0L, maxBucketSize = Int.MaxValue)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingNearDup.Candidate], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    sink.result(spark, ckpt,
        spark.emptyDataset[StreamingNearDup.Candidate].toDF())
      .select(col("id_a"), col("id_b"), col("band"))
  }

  /** Replay [[StreamingNearDup.candidates]] PLUS the verification stage
    * — the streaming path now ends at verified pairs exactly like batch
    * [[graft.operators.Dedup.minHashLsh]] does, instead of handing raw
    * band collisions to the consumer. Each micro-batch's candidates
    * dedup on (id_a, id_b) and join a broadcast shingle store (built
    * once, pinned in memory; production swaps in a document-store
    * lookup) computing the exact intersect/union Jaccard, and only
    * pairs at or above `verifyThreshold` land in the sink — the
    * foreachBatch verification join the operator's scaladoc prescribes,
    * made concrete.
    *
    * Oracle contract: with expiry off and the cap disabled, the
    * verified set EQUALS the batch minHashLsh output on the same corpus
    * (same shingle arrays, same Jaccard expression, same threshold) —
    * candidates are the banding collisions in closed form, and every
    * band of a pair emits in the one micro-batch where the pair's later
    * document arrives, so the per-batch dedup yields each pair exactly
    * once across the replay (no cross-batch duplicates to reconcile).
    *
    * @param docs (doc_id, text) — extra columns ignored
    * @return (id_a, id_b, jaccard), id_a < id_b, jaccard >= threshold
    */
  def nearDupVerified(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                      shingleN: Int = 3, verifyThreshold: Double = 0.5,
                      chunks: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val runner = runnerSession(spark)
    implicit val sqlCtx: SQLContext = runner.sqlContext

    val rows = docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq

    // the shingle store lives on the runner session (foreachBatch frames
    // are bound to it — joining across sessions is undefined behavior)
    val store = {
      import runner.implicits._
      rows.toDF("doc_id", "text")
        .select(col("doc_id").as("_id"),
          graft.operators.Dedup.shingles(col("text"), shingleN).as("_sh"))
        .localCheckpoint(true)
    }

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val sink = new Collector
    val ckpt = tmp("graft-replay-ndv-ckpt")

    drain(input, rows, chunks) {
      StreamingNearDup.candidates(stream, numHashes, bands, shingleN,
          idleHorizonMinutes = 0L, maxBucketSize = Int.MaxValue)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingNearDup.Candidate], _: Long) =>
          val _ver = df.select(col("id_a"), col("id_b")).distinct()
            .join(broadcast(store.select(col("_id").as("id_a"), col("_sh").as("_sh_a"))), "id_a")
            .join(broadcast(store.select(col("_id").as("id_b"), col("_sh").as("_sh_b"))), "id_b")
            .withColumn("jaccard",
              size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("double") /
                size(array_union(col("_sh_a"), col("_sh_b"))).cast("double"))
            .filter(col("jaccard") >= verifyThreshold)
            .select(col("id_a"), col("id_b"), col("jaccard"))
          sink.add(_ver)
          ()
        }
        .start()
    }

    val empty = spark.emptyDataset[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard")
    sink.result(spark, ckpt, empty)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def dedupOutOfOrder(docs: DataFrame, chunks: Int = 4): DataFrame = {
    require(chunks >= 2, "out-of-order replay needs at least 2 chunks")
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext

    val rows = docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)].collect()
    val batches: Seq[Seq[(Long, String)]] = (0 until chunks).map { p =>
      rows.filter { case (i, _) => java.lang.Math.floorMod(i, chunks.toLong) == p }
        .sortBy(_._1).toSeq
    }

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val sink = new Collector
    val ckpt = tmp("graft-replay-dooo-ckpt")

    drain(input, Seq.empty, 1, tail = batches) {
      StreamingDedup.dedup(stream, idleHorizonMinutes = 0L, emitDuplicates = true)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingDedup.Emitted], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    sink.result(spark, ckpt,
        spark.emptyDataset[StreamingDedup.Emitted].toDF())
      .select(col("doc_id"), col("text_hash"), col("is_first"), col("first_doc_id"))
  }

  /** Replay [[StreamingQuota.quota]] over a bounded table in drop mode.
    * Rows arrive in (event-time, id) order, the regime where the
    * streaming admission provably matches [[StreamingQuota.quotaBatch]]
    * (out-of-order lateness handling diverges by design — spec-pinned).
    *
    * @param docs (group, doc_id, t_us) under the given column names
    * @return (grp, doc_id, window_start_us, seq_in_window, admitted)
    */
  def quota(docs: DataFrame, quotaN: Long, windowMinutes: Long,
            groupCol: String = "lang", idCol: String = "doc_id", timeCol: String = "t_us",
            chunks: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext

    val rows = docs.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(timeCol).cast("long"))
      .as[(String, Long, Long)].collect().sortBy { case (_, i, t) => (t, i) }.toSeq

    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("group", "doc_id", "t_us")
    val sink = new Collector
    val ckpt = tmp("graft-replay-quota-ckpt")

    drain(input, rows, chunks) {
      StreamingQuota.quota(stream, quotaN, windowMinutes, groupCol = "group",
          idCol = "doc_id", timeCol = "t_us", emitRejected = false, idleHorizonMinutes = 0L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingQuota.Admitted], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    sink.result(spark, ckpt, spark.emptyDataset[StreamingQuota.Admitted].toDF())
      .select(col("group").as("grp"), col("doc_id"), col("window_start_us"),
        col("seq_in_window"), col("admitted"))
  }

  /** Replay [[StreamingHeavyHitters.windowCounts]] and rank the
    * finalized windows. A far-future sentinel row rides ON the last
    * data batch to advance the watermark past every real window
    * (append mode emits a window's finals only once the watermark
    * crosses its end), and ONE extra sentinel-only batch gives the
    * engine the flush cycle it runs after a watermark-only advance.
    * The sentinel key is filtered from the result; its own window
    * never finalizes.
    * The in-order feed (global (t, id) sort, equal chunks) keeps every
    * row inside the lateness delay, so the finalized counts equal the
    * batch groupBy exactly — the oracle's contract.
    */
  def heavyHitters(events: DataFrame, k: Int, windowMinutes: Long, delayMinutes: Long,
                   keyCol: String = "event_type", idCol: String = "event_id",
                   timeCol: String = "t_us", chunks: Int = 3): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext
    // (A/B note: disabling no-data micro-batches on the runner clone
    // halves the commits but CHANGES the late-drop set — the no-data
    // batch is where the advanced watermark lands before the next data
    // batch's stateful filter reads it — so the default stays.)

    val rows = events.select(col(keyCol).cast("string"), col(idCol).cast("long"),
        col(timeCol).cast("long"))
      .as[(String, Long, Long)].collect().sortBy { case (_, i, t) => (t, i) }.toSeq
    val sentinelKey = " flush"
    val tMax = rows.iterator.map(_._3).foldLeft(0L)(math.max)
    val flushT = tMax + (delayMinutes + 2 * windowMinutes) * 60L * 1000000L
    // two sentinel ROWS but only ONE extra micro-batch: the first flush
    // row rides at the tail of the last data batch (it is the max event
    // time, so in-batch order is preserved), advancing the watermark
    // past every real window; the second, later batch then triggers
    // their finalization. Every state-store commit is ~0.7 s of the
    // gate, so batches are the cost unit here — same finalized set as
    // the two-sentinel-batch layout, one commit fewer.
    val flush1 = (sentinelKey, -1L, flushT)
    val flush2 = (sentinelKey, -2L, flushT + windowMinutes * 60L * 1000000L)
    val per = math.max(1, math.ceil(rows.length.toDouble / chunks).toInt)
    val dataBatches = rows.grouped(per).toSeq
    val tail =
      (if (dataBatches.isEmpty) Seq(Seq(flush1))
       else dataBatches.init :+ (dataBatches.last :+ flush1)) :+ Seq(flush2)

    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("event_type", "event_id", "t_us")
    val sink = new Collector
    val ckpt = tmp("graft-replay-hh-ckpt")

    drain(input, Seq.empty, 1, tail) {
      StreamingHeavyHitters.windowCounts(stream, windowMinutes, delayMinutes)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    val empty = spark.range(0)
      .select(col("id").as("window_start_us"), lit("").as("key"), col("id").as("n"))
      .limit(0)
    StreamingHeavyHitters.topK(
      sink.result(spark, ckpt, empty).filter(col("key") =!= sentinelKey), k)
  }

  /** Replay [[StreamingHeavyHitters.windowCounts]] with a deterministic
    * OUT-OF-ORDER feed (micro-batch p carries the rows with id ≡ p mod
    * `chunks`) — the regime where the engine's late-row rule actually
    * fires. The divergence from batch has a CLOSED FORM the oracle
    * encodes: a row in batch p is dropped iff the max event time over
    * batches before p is ≥ its window end + the delay. That predicate
    * is exact under either watermark clock resolution because window
    * ends and the delay are millisecond-aligned (see
    * WatermarkBoundaryProbeSpec, which pins the `end <= wm` boundary
    * the form is derived from); dropped rows still ADVANCE the
    * watermark (the event-time stats run before the stateful filter),
    * so the running max is over all rows, kept or not. Finalized
    * counts are the kept rows grouped; a window that already emitted
    * can never receive a kept late row (emitted ⟺ the row would have
    * been dropped).
    */
  def heavyHittersOutOfOrder(events: DataFrame, k: Int, windowMinutes: Long,
                             delayMinutes: Long, keyCol: String = "event_type",
                             idCol: String = "event_id", timeCol: String = "t_us",
                             chunks: Int = 4): DataFrame = {
    require(chunks >= 2, "out-of-order replay needs at least 2 chunks")
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext
    // no-data micro-batches stay ON — see the heavyHitters A/B note

    val rows = events.select(col(keyCol).cast("string"), col(idCol).cast("long"),
        col(timeCol).cast("long"))
      .as[(String, Long, Long)].collect()
    val batches: Seq[Seq[(String, Long, Long)]] = (0 until chunks).map { p =>
      rows.filter { case (_, i, _) => java.lang.Math.floorMod(i, chunks.toLong) == p }
        .sortBy { case (_, i, t) => (t, i) }.toSeq
    }
    val sentinelKey = " flush"
    val tMax = rows.iterator.map(_._3).foldLeft(0L)(math.max)
    val flushT = tMax + (delayMinutes + 2 * windowMinutes) * 60L * 1000000L
    // flush1 rides the last data batch (max event time, so it cannot
    // affect that batch's own drop decisions — the watermark a row is
    // judged against comes from EARLIER batches only) and flush2 is the
    // single extra commit that finalizes everything; see heavyHitters
    val flush1 = (sentinelKey, -1L, flushT)
    val flush2 = (sentinelKey, -2L, flushT + windowMinutes * 60L * 1000000L)
    val nonEmpty = batches.filter(_.nonEmpty)
    val tail =
      (if (nonEmpty.isEmpty) Seq(Seq(flush1))
       else nonEmpty.init :+ (nonEmpty.last :+ flush1)) :+ Seq(flush2)

    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("event_type", "event_id", "t_us")
    val sink = new Collector
    val ckpt = tmp("graft-replay-hhooo-ckpt")

    drain(input, Seq.empty, 1, tail) {
      StreamingHeavyHitters.windowCounts(stream, windowMinutes, delayMinutes)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    val empty = spark.range(0)
      .select(col("id").as("window_start_us"), lit("").as("key"), col("id").as("n"))
      .limit(0)
    StreamingHeavyHitters.topK(
      sink.result(spark, ckpt, empty).filter(col("key") =!= sentinelKey), k)
  }

  /** Replay [[StreamingQuota.quota]] with a deterministic OUT-OF-ORDER
    * feed: micro-batch p (p = 0..chunks−1) carries exactly the rows with
    * doc_id ≡ p (mod chunks), so every batch after the first delivers
    * rows that are LATE relative to the event-time horizon earlier
    * batches already advanced — the regime where streaming admission
    * diverges from the batch twin by design.
    *
    * The divergence has a closed form (the oracle's contract, pinned by
    * StreamingQuotaSpec): the operator counts a late row against the
    * NEWEST window its group has opened, and within one micro-batch it
    * processes rows in (t, id) order with window starts monotone in t —
    * so a row's effective window is
    *   E = max(own window start, max window start over earlier batches)
    * and admission is `row_number() over (group, E ordered by
    * (batch, t, id)) <= quota`, stamped with E.
    */
  def quotaOutOfOrder(docs: DataFrame, quotaN: Long, windowMinutes: Long,
                      groupCol: String = "lang", idCol: String = "doc_id",
                      timeCol: String = "t_us", chunks: Int = 4): DataFrame = {
    require(chunks >= 2, "out-of-order replay needs at least 2 chunks")
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext

    val rows = docs.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(timeCol).cast("long"))
      .as[(String, Long, Long)].collect()
    val batches: Seq[Seq[(String, Long, Long)]] = (0 until chunks).map { p =>
      rows.filter { case (_, i, _) => java.lang.Math.floorMod(i, chunks.toLong) == p }
        .sortBy { case (_, i, t) => (t, i) }.toSeq
    }

    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF().toDF("group", "doc_id", "t_us")
    val sink = new Collector
    val ckpt = tmp("graft-replay-qooo-ckpt")

    drain(input, Seq.empty, 1, tail = batches) {
      StreamingQuota.quota(stream, quotaN, windowMinutes, groupCol = "group",
          idCol = "doc_id", timeCol = "t_us", emitRejected = false, idleHorizonMinutes = 0L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingQuota.Admitted], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    sink.result(spark, ckpt, spark.emptyDataset[StreamingQuota.Admitted].toDF())
      .select(col("group").as("grp"), col("doc_id"), col("window_start_us"),
        col("seq_in_window"), col("admitted"))
  }

  /** Replay [[StreamingAsOf.enrich]] over bounded event/label tables:
    * the point-in-time enrichment shape. One tagged feed, globally
    * sorted by (t, labels-before-events, id) then equal row chunks —
    * the same global-time-order recipe as [[sessionize]], which keeps
    * every user's rows in-order across micro-batches; labels sort
    * before events at the same instant so an at-that-moment label is
    * visible to its event even across a chunk boundary.
    *
    * @param events (event_id, user_id, t_us) — extra columns ignored
    * @param labels (label_id, user_id, t_us) — extra columns ignored
    * @return (event_id, user_id, t_us, label_id, label_t_us), one row
    *         per event; label columns null before a user's first label
    */
  def asOf(events: DataFrame, labels: DataFrame, chunks: Int = 4): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext

    val evRows = events
      .select(col("event_id").cast("long"), col("user_id").cast("long"), col("t_us").cast("long"))
      .as[(Long, Long, Long)].collect().map { case (i, u, t) => (u, false, i, t) }
    val labRows = labels
      .select(col("label_id").cast("long"), col("user_id").cast("long"), col("t_us").cast("long"))
      .as[(Long, Long, Long)].collect().map { case (i, u, t) => (u, true, i, t) }
    val rows = (evRows ++ labRows)
      .sortBy { case (_, isLabel, id, t) => (t, !isLabel, id) }.toSeq

    val input = MemoryStream[(Long, Boolean, Long, Long)]
    val stream = input.toDF().toDF("user_id", "is_label", "id", "t_us")
    val sink = new Collector
    val ckpt = tmp("graft-replay-asof-ckpt")

    drain(input, rows, chunks) {
      StreamingAsOf.enrich(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingAsOf.Enriched], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    sink.result(spark, ckpt, spark.emptyDataset[StreamingAsOf.Enriched].toDF())
      .select(col("event_id"), col("user_id"), col("t_us"), col("label_id"), col("label_t_us"))
  }

  /** Replay [[StreamingIntervalJoin.enrich]] over bounded event/label
    * tables — the TWO-INPUT stream-stream join shape (colocation is the
    * self-join). Both feeds advance in lockstep over COMMON time
    * boundaries, each ordered by its own watermark column (events by
    * ts, labels by finished_at), so neither stream ever delivers a
    * watermark-late row and the inner join's output is
    * chunk-count-invariant: Spark evicts join state only when the other
    * side's watermark proves no future row can match, which under
    * in-order feeds never removes a live partner.
    *
    * With `leftOuter = true` the replay drives
    * [[StreamingIntervalJoin.enrichLeftOuter]] instead: unmatched
    * events emit null-extended ONLY once the global watermark passes
    * `ts + maxDuration`, so after the last real chunk the replay feeds
    * a sentinel batch on BOTH inputs (Spark's global watermark is the
    * MIN across watermark columns — one side alone would hold it back)
    * far enough ahead (`watermark + maxDuration + slack`) to evict
    * every real row, then one more sentinel batch to run the
    * post-watermark-update eviction pass (watermarks take effect in
    * the batch AFTER the one that advanced them; no-data batches are
    * disabled here for batch determinism). Sentinel rows carry
    * `user_id = -1` and are dropped from the returned frame; real
    * user ids are nonnegative by the events-table contract.
    *
    * @param events (event_id, user_id, t_us) — extra columns ignored
    * @param labels (label_id, user_id, s_us, f_us, label) with every
    *               interval no longer than `maxDurationMinutes`
    * @return (event_id, user_id, t_us, label_id, label), one row per
    *         containing interval; with `leftOuter` also one
    *         (event_id, user_id, t_us, null, null) row per
    *         never-matched event
    */
  def intervalJoin(events: DataFrame, labels: DataFrame, maxDurationMinutes: Int,
                   watermarkMinutes: Int = 60, chunks: Int = 2,
                   leftOuter: Boolean = false): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val runner = runnerSession(spark)
    // same reasoning as the colocation replay: an INNER stream-stream
    // join emits on match and the lockstep in-order feeds are never
    // late, so the no-data micro-batch after each drained chunk only
    // evicts state — output-neutral, and skipping it removes one full
    // micro-batch's planning+commit round per chunk (the replay's cost
    // unit; oracle-checked identical)
    runner.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    implicit val sqlCtx: SQLContext = runner.sqlContext

    val evRows = events
      .select(col("event_id").cast("long"), col("user_id").cast("long"), col("t_us").cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._3, r._1)).toSeq
    val labRows = labels
      .select(col("label_id").cast("long"), col("user_id").cast("long"),
        col("s_us").cast("long"), col("f_us").cast("long"), col("label").cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._4, r._1)).toSeq

    // common boundaries over the union of both watermark-column time
    // sets: both feeds cross each boundary in the same micro-batch
    val times = (evRows.map(_._3) ++ labRows.map(_._4)).sorted
    // empty-feed guard: with no rows there are no boundaries (every other
    // replay tolerates an empty feed; indexing times(0) here would throw)
    val bounds =
      if (times.isEmpty) Seq.empty[Long]
      else (1 until chunks).map(i => times(((times.length.toLong * i) / chunks).toInt))
    def bucket(t: Long): Int = bounds.count(_ <= t)

    val evIn = MemoryStream[(Long, Long, Long)]
    val labIn = MemoryStream[(Long, Long, Long, Long, Long)]
    val evStream = evIn.toDF().toDF("event_id", "user_id", "t_us")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("t_us")).as("ts"))
    val labStream = labIn.toDF().toDF("label_id", "user_id", "s_us", "f_us", "label")
      .select(col("label_id"), col("user_id"), col("label"),
        timestamp_micros(col("s_us")).as("started_at"),
        timestamp_micros(col("f_us")).as("finished_at"))
    val sink = new Collector
    val ckpt = tmp("graft-replay-ivj-ckpt")

    val joined =
      if (leftOuter)
        StreamingIntervalJoin.enrichLeftOuter(evStream, labStream,
          maxDurationMinutes, watermarkMinutes)
      else
        StreamingIntervalJoin.enrich(evStream, labStream, maxDurationMinutes, watermarkMinutes)
    val q = joined
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink.add(df); ()
      }
      .start()
    try {
      (0 until chunks).foreach { b =>
        val ev = evRows.filter(r => bucket(r._3) == b)
        val lb = labRows.filter(r => bucket(r._4) == b)
        if (ev.nonEmpty) evIn.addData(ev)
        if (lb.nonEmpty) labIn.addData(lb)
        q.processAllAvailable()
      }
      if (leftOuter && times.nonEmpty) {
        // sentinel flush (see scaladoc): both watermark columns must
        // advance past every real row's eviction point, then one more
        // batch runs the eviction that emits the trailing null rows
        val flushT = times.last +
          (watermarkMinutes.toLong + maxDurationMinutes.toLong + 10L) * 60000000L
        evIn.addData(Seq((-1L, -1L, flushT)))
        labIn.addData(Seq((-1L, -1L, flushT, flushT + 1L, 0L)))
        q.processAllAvailable()
        evIn.addData(Seq((-2L, -1L, flushT + 60000000L)))
        q.processAllAvailable()
      }
    } finally q.stop()

    val empty = spark.emptyDataset[(Long, Long, Long, Long, Long)]
      .toDF("event_id", "user_id", "t_us", "label_id", "label")
    val raw = sink.result(spark, ckpt, empty)
    val got = if (leftOuter) raw.filter(col("user_id") >= 0) else raw
    if (got.columns.contains("ts"))
      got.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("label_id"), col("label"))
    else got
  }

  /** Replay [[StreamingColocation.meetings]] over a bounded interval
    * table — unlike the keyed-state replays above, this drives the
    * OTHER streaming shape: a watermarked stream-stream symmetric hash
    * self-join. Inner joins emit on match, so no sentinel flush is
    * needed; rows arrive in started_at order so nothing is
    * watermark-late.
    *
    * @param intervals (user_id, s_us, f_us, lon, lat) — extra ignored
    * @return (user_a, user_b, m_s_us, m_f_us)
    */
  def colocation(intervals: DataFrame, cellMicroDeg: Long = 10000L,
                 maxDurationMinutes: Int = 600, watermarkMinutes: Int = 60,
                 chunks: Int = 8): DataFrame = {
    val spark = intervals.sparkSession
    import spark.implicits._
    // stays at 4 partitions: A/B at 2/4/8 measured within noise of each
    // other — this gate is bounded by per-batch pair compute and the
    // per-batch output collect, not by state-store commit fan-out, so
    // the keyed-state gates' 2-partition trim buys nothing here
    val runner = runnerSession(spark, partitions = 4)
    // unlike the windowed-agg replays (whose late-DROP set moves with
    // this conf — see heavyHitters), the symmetric-hash INNER join
    // emits eagerly on match and an in-order feed is never late, so the
    // no-data micro-batch after each drained chunk only evicts state:
    // output-neutral here, and skipping it halves the per-chunk commits
    // of the priciest replay gate (isolated: the runner is a per-call
    // clone; oracle-checked identical)
    runner.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    implicit val sqlCtx: SQLContext = runner.sqlContext

    val rows = intervals
      .select(col("user_id").cast("long"), col("s_us").cast("long"), col("f_us").cast("long"),
        col("lon").cast("double"), col("lat").cast("double"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .sortBy { case (u, s, _, _, _) => (s, u) }.toSeq

    val input = MemoryStream[(Long, Long, Long, Double, Double)]
    val stream = input.toDF().toDF("user_id", "s_us", "f_us", "lon", "lat")
      .select(col("user_id"), timestamp_micros(col("s_us")).as("started_at"),
        timestamp_micros(col("f_us")).as("finished_at"), col("lon"), col("lat"))
    val sink = new Collector
    val ckpt = tmp("graft-replay-colo-ckpt")

    drain(input, rows, chunks) {
      StreamingColocation.meetings(stream, cellMicroDeg, maxDurationMinutes, watermarkMinutes)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    val empty = spark.emptyDataset[(Long, Long, Long, Long)]
      .toDF("user_a", "user_b", "m_s_us", "m_f_us")
    val got = sink.result(spark, ckpt, empty)
    if (got.columns.contains("m_started_at"))
      got.select(col("user_a"), col("user_b"),
        unix_micros(col("m_started_at")).as("m_s_us"),
        unix_micros(col("m_finished_at")).as("m_f_us"))
    else got
  }

  /** Replay [[StreamingStaypoints.detect]] over a bounded positionfix
    * table. After the real chunks, one final micro-batch of per-user
    * sentinel fixes — same timestamp as the user's last fix (so the
    * emitted tail keeps the batch operator's finished time), one degree
    * of longitude away (≥ 70 km, an unconditional distance break) —
    * flushes each user's tail candidate exactly like the batch scan's
    * `includeLast`. Sentinel-anchored candidates die with the stream and
    * sentinels never join a candidate (they always breach), so no output
    * filtering is needed.
    *
    * @param pfs (id, user_id, t_us, lon, lat) — extra columns ignored
    * @return (user_id, s_us, f_us, n_pfs)
    */
  def staypoints(pfs: DataFrame, params: StreamingStaypoints.Params = StreamingStaypoints.Params(),
                 chunks: Int = 8): DataFrame = {
    val spark = pfs.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = runnerSession(spark).sqlContext

    val rows = pfs
      .select(col("id").cast("long"), col("user_id").cast("long"), col("t_us").cast("long"),
        col("lon").cast("double"), col("lat").cast("double"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .sortBy { case (i, _, t, _, _) => (t, i) }.toSeq

    val sentinels = rows.groupBy(_._2).map { case (u, rs) =>
      val last = rs.maxBy(r => (r._3, r._1))
      (Long.MaxValue, u, last._3, last._4 + 1.0, last._5)
    }.toSeq.sortBy(_._2)

    val input = MemoryStream[(Long, Long, Long, Double, Double)]
    val stream = input.toDF().toDF("id", "user_id", "t_us", "lon", "lat")
      .select(col("id"), col("user_id"), timestamp_micros(col("t_us")).as("tracked_at"),
        col("lon"), col("lat"))
    val sink = new Collector
    val ckpt = tmp("graft-replay-sp-ckpt")

    drain(input, rows, chunks, tail = Seq(sentinels)) {
      StreamingStaypoints.detect(stream, params)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[StreamingStaypoints.Staypoint], _: Long) =>
          sink.add(df); ()
        }
        .start()
    }

    sink.result(spark, ckpt,
        spark.emptyDataset[StreamingStaypoints.Staypoint].toDF())
      .select(col("user_id"), col("started_us").as("s_us"), col("finished_us").as("f_us"),
        col("n_pfs").cast("long").as("n_pfs"))
  }
}
