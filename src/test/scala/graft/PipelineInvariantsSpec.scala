package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The documented model invariants (reference model/trips.py:33-40) over
  * the full derived pipeline at sf0.001: staypoints don't overlap per
  * user, triplegs have >= 2 points, every trip contains >= 1 tripleg,
  * tours span their member trips.
  */
class PipelineInvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("staypoints are temporally disjoint and well-formed per user") {
    val sp = Pipeline.staypoints(spark, dir)
    assert(sp.filter(col("finished_at") < col("started_at")).count() == 0)
    val w = Window.partitionBy("user_id").orderBy("started_at")
    val overlaps = sp
      .withColumn("_prev_fin", lag(col("finished_at"), 1).over(w))
      .filter(col("_prev_fin").isNotNull && col("started_at") < col("_prev_fin"))
    assert(overlaps.count() == 0)
  }

  test("every tripleg has >= 2 points and positive duration") {
    val tpls = Pipeline.triplegs(spark, dir)
    assert(tpls.filter(size(col("points")) < 2).count() == 0)
    assert(tpls.filter(col("finished_at") <= col("started_at")).count() == 0)
  }

  test("ids are dense from 0 for staypoints and triplegs") {
    val sp = Pipeline.staypoints(spark, dir)
    val n = sp.count()
    assert(sp.agg(min("id"), max("id")).first().toSeq == Seq(0L, n - 1))
    val tpls = Pipeline.triplegs(spark, dir)
    val m = tpls.count()
    assert(tpls.agg(min("id"), max("id")).first().toSeq == Seq(0L, m - 1))
  }

  test("every trip contains at least one tripleg; trips nest inside their tour") {
    val trips = Pipeline.trips(spark, dir)
    val tours = Pipeline.tours(spark, dir)
    // via the tour->trips mapping: all member trips exist and lie within the tour span
    val exploded = tours.select(col("id").as("tour_id"), col("started_at").as("t_s"),
      col("finished_at").as("t_f"), explode(col("trips")).as("trip_id"))
    val joined = exploded.join(trips, trips("id") === exploded("trip_id"))
    assert(joined.count() == exploded.count()) // no dangling trip ids
    assert(joined.filter(col("started_at") < col("t_s") || col("finished_at") > col("t_f")).count() == 0)
  }

  test("staypoint linkage: every linked pf's staypoint exists and matches its user") {
    val pfsSp = Pipeline.pfsWithStaypoints(spark, dir)
    val sp = Pipeline.staypoints(spark, dir)
    val linked = pfsSp.filter(col("staypoint_id").isNotNull)
      .select(col("user_id").as("_pu"), col("staypoint_id"))
      .join(sp, col("staypoint_id") === sp("id"))
    assert(linked.filter(col("_pu") =!= col("user_id")).count() == 0)
  }

  test("dedupSpans conserves words: kept tokens + removed positions = original count") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/../sf0.01/documents.parquet")
    val out = operators.Dedup.dedupSpans(docs, n = 10)
    // token count of the re-joined text must equal n_words - n_removed
    // (empty deduped text -> size(split) is 1 for "", handle via when)
    val kept = when(length(col("text_deduped")) === 0, 0L)
      .otherwise(size(split(col("text_deduped"), " ")).cast("long"))
    val broken = out.filter(kept + col("n_removed") =!= col("n_words"))
    assert(broken.count() == 0)
    // removal is idempotent: no duplicate 10-gram survives across the
    // deduplicated corpus (every remaining occurrence is the global first)
    val again = operators.Dedup.dedupSpans(
      out.select(col("doc_id"), col("text_deduped").as("text")), n = 10)
    assert(again.filter(col("n_removed") > 0).count() == 0,
      "a second pass must find nothing left to remove")
  }

  test("od flows conserve transitions: per-user flow total = visits - 1") {
    val spLoc = Pipeline.staypointsWithLocation(spark, dir)
    val flows = operators.Metrics.odFlows(spLoc)
    val totalFlows = flows.agg(sum(col("n_transitions"))).collect()(0).getLong(0)
    val perUser = spLoc.filter(col("location_id").isNotNull)
      .groupBy("user_id").count()
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    assert(totalFlows === perUser)
  }

  test("share-hook equivalence: parquet stage boundaries == localCheckpoint, bit for bit") {
    // the documented 100 TB swap (Pipeline.parquetShare) must be a pure
    // materialization choice — iterative trainers threaded through either
    // hook produce identical models/trajectories
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaLocal = operators.TextAnalysis
      .bpeTrain(docs, merges = 4, share = _.localCheckpoint(false))
      .orderBy("step").collect().map(_.toSeq)
    val dir = java.nio.file.Files.createTempDirectory("graft_share").toString
    val viaParquet = operators.TextAnalysis
      .bpeTrain(docs, merges = 4, share = Pipeline.parquetShare(dir))
      .orderBy("step").collect().map(_.toSeq)
    assert(viaLocal.toSeq == viaParquet.toSeq)

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val kmLocal = operators.KMeans.fit(emb, k = 4, iters = 2, share = _.localCheckpoint(false))
    val kmParquet = operators.KMeans.fit(emb, k = 4, iters = 2,
      share = Pipeline.parquetShare(s"$dir/km"))
    assert(kmLocal.centroids.map(_.toSeq).toSeq == kmParquet.centroids.map(_.toSeq).toSeq)
    assert(kmLocal.counts.toSeq == kmParquet.counts.toSeq)
  }
}
