package graft

import graft.operators.SpatialOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only density-controlled scaling audit of the contact-graph gate
  * family (r14 verdict #1). The driver's synthetic corpus pins every
  * user to the SAME 4 places (EventsAdapter.scala:47-53), so its
  * contact graph is near-complete and pair volume grows ~users² — an
  * input property that made the family un-runnable in the round-14
  * sf1-equivalent audit (sf1 ≈ 112M pairs, >40 GB spill; SURVEY §6).
  * Real mobility corpora are SPARSE: contacts concentrate in bounded
  * social neighborhoods, so pair volume grows ~linearly with users
  * (constant average degree). This probe builds that corpus shape
  * directly at the intervals level — the exact input contract of
  * [[SpatialOps.colocationMeetings]], which is where every family gate
  * starts — because the events→positionfix adapter's geometry cannot
  * be made sparse from the events table (coordinates are a function of
  * the per-user fix index only).
  *
  * Corpus model: users partitioned into bounded communities (sizes
  * cycling 10/15/25/40/60, mean 30 — heterogeneous so degree-shaped
  * diagnostics stay non-degenerate); each community owns 4 private
  * places on a 0.2-degree grid (20 cells of separation at the family's
  * 0.01-degree cell width — zero cross-community candidates by
  * construction); every member tours the community's places in the
  * gates' dwell cadence (30-min steps, 20-min stays, ≤4-min per-user
  * jitter), so each intra-community pair meets once per step — degree
  * is bounded by community size at every scale, and pair volume grows
  * linearly with users.
  *
  * Each family diagnostic then runs with the REGISTRY GATE'S exact
  * parameters and shared-prolog attribution (contactGraph + Louvain L1
  * billed once, diagnostics billed marginal — mirroring
  * Pipeline.contactGraph / Pipeline.louvainLabels). Scales are user
  * counts; sf0.1-eq = 1500 users × 64 fixes (the real sf0.1 shape),
  * sf1-sparse = 15000. Results → SURVEY §6.
  */
object ColocationScaleProbe {

  /** Deterministic sparse intervals: (user_id, s_us, f_us, k, lon, lat).
    * Communities are HETEROGENEOUS in size — each 150-user block splits
    * into five communities of 10/15/25/40/60 members (mean 30) — so the
    * degree distribution spans 9..59 and degree-shaped diagnostics
    * (rich club, knn(k), degree histogram) produce non-degenerate
    * curves instead of a single spike.
    */
  def sparseIntervals(spark: SparkSession, nUsers: Long, rowsPerUser: Int): DataFrame = {
    spark.range(nUsers * rowsPerUser)
      .select(expr(s"id div $rowsPerUser").as("user_id"),
        (col("id") % rowsPerUser).as("k"))
      .withColumn("off", col("user_id") % 150)
      .withColumn("comm", expr("(user_id div 150) * 5") + expr(
        "case when off < 10 then 0 when off < 25 then 1 when off < 50 then 2 " +
          "when off < 90 then 3 else 4 end"))
      .withColumn("place", expr("(k div 12) % 4"))
      // integer-exact microdegree math, one final cast — the repo's
      // engine-exactness idiom (EventsAdapter), though this probe never
      // crosses an oracle boundary
      .withColumn("lon", (lit(-122.4) + (col("comm") % 100).cast("double") * 0.2
        + col("place").cast("double") * 0.01
        + ((col("user_id") * 7919 + col("k") * 104729) % 200).cast("double") * 1e-6))
      .withColumn("lat", (lit(47.6) + expr("comm div 100").cast("double") * 0.2
        + col("place").cast("double") * 0.005
        + ((col("user_id") * 104729 + col("k") * 7919) % 200).cast("double") * 1e-6))
      .withColumn("s_us", col("k") * lit(1800000000L) + (col("user_id") % 5) * lit(60000000L))
      .withColumn("f_us", col("s_us") + lit(1200000000L))
      .select(col("user_id"), col("s_us"), col("f_us"), col("k"), col("lon"), col("lat"))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val userScales: Seq[Long] = args.headOption
      .map(_.split(",").toSeq.map(_.trim.toLong)).getOrElse(Seq(1500L, 15000L))
    val rowsPerUser = if (args.length > 1) args(1).toInt else 64

    def t(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-34s $sec%7.2f s  ($n rows)")
      sec
    }

    t("warmup") { spark.range(1000000).count() }

    for (nUsers <- userScales) {
      val tag = s"u$nUsers"
      println(s"[probe] === $tag (${nUsers / 150 * 5} communities of 10-60 " +
        s"members, $rowsPerUser fixes/user) ===")
      val iv = sparseIntervals(spark, nUsers, rowsPerUser)
        .localCheckpoint(eager = true)
      t(s"${tag}_intervals") { iv.count() }

      // prolog part 1: banded meeting join → per-pair contact table
      // (Pipeline.colocationMeetings + colocationPairs, gate params)
      var pairs: DataFrame = null
      t(s"${tag}_pairs_build") {
        pairs = SpatialOps.colocationPairsFromMeetings(
            SpatialOps.colocationMeetings(iv, cellMicroDeg = 10000L, bandMinutes = 120.0))
          .localCheckpoint(eager = true)
        pairs.count()
      }
      // prolog part 2: symmetric edges + fused degree tables
      // (Pipeline.contactGraph — the colocation__prolog bench line)
      var g: SpatialOps.ContactGraph = null
      t(s"${tag}_prolog_graph") {
        g = SpatialOps.contactGraph(pairs)
        g.nNodes
      }
      // shared Louvain L1 labels (Pipeline.louvainLabels memo)
      var labels: DataFrame = null
      t(s"${tag}_louvain_l1") {
        labels = SpatialOps.louvainLabels(pairs, rounds = 4, graph = Some(g))
          .localCheckpoint(eager = true)
        labels.count()
      }

      // the 16 family gates, marginal cost, registry parameters
      t(s"${tag}_degrees") { SpatialOps.colocationDegrees(pairs, graph = Some(g)).count() }
      t(s"${tag}_pagerank") { SpatialOps.colocationPagerank(pairs, iters = 3, graph = Some(g)).count() }
      t(s"${tag}_components") { SpatialOps.colocationComponents(pairs).count() }
      t(s"${tag}_communities") { SpatialOps.colocationCommunities(pairs, rounds = 3, graph = Some(g)).count() }
      t(s"${tag}_kcore") { SpatialOps.kCoreHistogram(pairs, rounds = 3, graph = Some(g)).count() }
      t(s"${tag}_ball") { SpatialOps.neighborhoodFunction(pairs, seedsMod = 64L, maxHops = 3, graph = Some(g)).count() }
      t(s"${tag}_degree_correlation") { SpatialOps.degreeCorrelation(pairs, graph = Some(g)).count() }
      t(s"${tag}_richclub") { SpatialOps.richClub(pairs, graph = Some(g)).count() }
      t(s"${tag}_spectral") { SpatialOps.spectralRadius(pairs, rounds = 4, graph = Some(g)).count() }
      t(s"${tag}_louvain") { SpatialOps.colocationLouvain(pairs, rounds = 4,
        labels = Some(labels), graph = Some(g)).count() }
      t(s"${tag}_louvain_l2") { SpatialOps.colocationLouvainL2(pairs, rounds = 4, rounds2 = 4,
        labels = Some(labels), graph = Some(g)).count() }
      t(s"${tag}_louvain_connectivity") { SpatialOps.louvainConnectivity(pairs, rounds = 4,
        labels = Some(labels), graph = Some(g)).count() }
      t(s"${tag}_louvain_refined") { SpatialOps.colocationLouvainRefined(pairs, rounds = 4,
        labels = Some(labels), graph = Some(g)).count() }
      t(s"${tag}_assortativity") { SpatialOps.colocationAssortativity(pairs, graph = Some(g)).count() }
      // clustering/transitivity run UNFILTERED here: the registry gates
      // cap them to a 300-user subgraph only because the driver corpus
      // is near-complete (triangle enumeration would be ~C(n,3)); on a
      // sparse corpus full enumeration is the honest scale test
      // (per-node cost ∝ d², d constant by construction)
      t(s"${tag}_clustering_full") { SpatialOps.colocationClustering(pairs).count() }
      t(s"${tag}_transitivity_full") { SpatialOps.colocationTransitivity(pairs).count() }

      // distributed-path twins at the largest scale: force the Louvain
      // passes past the small-graph fallback (GraphProbe pins the same
      // at 11M pairs on the dense corpus)
      if (nUsers == userScales.max) {
        t(s"${tag}_louvain_l1_dist") { SpatialOps.louvainLabels(pairs, rounds = 4,
          localThreshold = 0L, graph = Some(g)).count() }
        t(s"${tag}_louvain_l2_dist") { SpatialOps.colocationLouvainL2(pairs, rounds = 4,
          rounds2 = 4, localThreshold = 0L, graph = Some(g)).count() }
      }
    }
    spark.stop()
  }
}
