package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared-prolog path (a [[SpatialOps.ContactGraph]] passed in, the
  * Pipeline memo's shape) must be BIT-IDENTICAL to each operator's
  * standalone derivation for every converted graph diagnostic — the
  * memo is a materialization strategy, never a semantics knob. A seeded
  * weighted pair fixture with hubs, leaves, ties and an isolated pair
  * exercises tie-breaks (LPA min-label, argmax order) on both paths.
  */
class ContactGraphParitySpec extends SparkSpec {
  import spark.implicits._

  private def pairs: DataFrame = {
    val rnd = new scala.util.Random(7)
    val rows = (for (i <- 0 until 40; j <- (i + 1) until 40
                     if rnd.nextDouble() < 0.15)
      yield (i.toLong, j.toLong, (rnd.nextInt(9) + 1).toLong)) ++
      Seq((100L, 101L, 5L), (100L, 101L, 5L)).distinct ++ // isolated pair
      Seq((0L, 1L, 3L), (0L, 2L, 3L)) // duplicate-weight ties off a hub
    rows.toDF("user_a", "user_b", "n_meetings")
      .groupBy("user_a", "user_b").agg(sum("n_meetings").as("n_meetings"))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("every graph diagnostic is bit-identical with and without the shared prolog") {
    val p = pairs.localCheckpoint(true)
    val g = Some(SpatialOps.contactGraph(p))
    val cases: Seq[(String, Option[SpatialOps.ContactGraph] => DataFrame)] = Seq(
      "degrees" -> (gr => SpatialOps.colocationDegrees(p, graph = gr)),
      "degree_correlation" -> (gr => SpatialOps.degreeCorrelation(p, graph = gr)),
      "assortativity" -> (gr => SpatialOps.colocationAssortativity(p, graph = gr)),
      "kcore" -> (gr => SpatialOps.kCoreHistogram(p, rounds = 3, graph = gr)),
      "richclub" -> (gr => SpatialOps.richClub(p, graph = gr)),
      "spectral" -> (gr => SpatialOps.spectralRadius(p, rounds = 3, graph = gr)),
      "pagerank" -> (gr => SpatialOps.colocationPagerank(p, iters = 3, graph = gr)),
      "communities" -> (gr => SpatialOps.colocationCommunities(p, rounds = 3, graph = gr)),
      "ball" -> (gr => SpatialOps.neighborhoodFunction(p, seedsMod = 2L, maxHops = 2, graph = gr)),
      "louvain" -> (gr => SpatialOps.colocationLouvain(p, rounds = 3, graph = gr)),
      "louvain_l2" -> (gr => SpatialOps.colocationLouvainL2(p, rounds = 3, rounds2 = 3, graph = gr)),
      "connectivity" -> (gr => SpatialOps.louvainConnectivity(p, rounds = 3, graph = gr)),
      "refined" -> (gr => SpatialOps.colocationLouvainRefined(p, rounds = 3, graph = gr)))
    cases.foreach { case (name, run) =>
      val withGraph = sortedRows(run(g))
      val standalone = sortedRows(run(None))
      assert(withGraph.nonEmpty, s"$name: empty result")
      assert(withGraph === standalone, s"$name: shared-prolog path diverged")
    }
  }

  test("the small-node proof gates the broadcast, never the result") {
    val p = pairs.localCheckpoint(true)
    val g = SpatialOps.contactGraph(p)
    assert(g.nNodes > 0 && g.broadcastNodeFrames)
    // forcing the at-scale shape (no broadcast) through a graph with a
    // fabricated huge node count must not change a single row
    val big = g.copy(nNodes = Long.MaxValue)
    assert(!big.broadcastNodeFrames)
    val a = sortedRows(SpatialOps.colocationPagerank(p, iters = 3, graph = Some(g)))
    val b = sortedRows(SpatialOps.colocationPagerank(p, iters = 3, graph = Some(big)))
    assert(a === b)
  }
}
