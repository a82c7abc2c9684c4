package graft
import graft.operators.TourGenerator
object PipeTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]"), shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[pipetime] $name%-12s ${(System.nanoTime()-t0)/1e9}%6.2f s  ($n rows)")
    }
    t("warmup") { spark.range(1000000).count() }
    t("ev_read") { spark.read.parquet(dir + "/events.parquet").count() }
    t("pfs") { graft.sources.EventsAdapter.positionfixes(spark, dir).count() }
    t("staypoints") { Pipeline.staypoints(spark, dir).count() }
    t("pfs_sp") { Pipeline.pfsWithStaypoints(spark, dir).count() }
    t("triplegs") { Pipeline.triplegs(spark, dir).count() }
    t("sp_act") { Pipeline.staypointsWithActivity(spark, dir).count() }
    t("trips") { Pipeline.trips(spark, dir).count() }
    t("locations") { Pipeline.locations(spark, dir).count() }
    t("tours") { Pipeline.tours(spark, dir).count() }
    t("tours_gap1") {
      TourGenerator.generate(Pipeline.trips(spark, dir), None,
        TourGenerator.Params(maxDistMeters = 200.0, maxTimeDays = 30.0, maxNrGaps = 1),
        share = _.localCheckpoint(false))._2.count()
    }
    t("tours_gap1b") {
      TourGenerator.generate(Pipeline.trips(spark, dir), None,
        TourGenerator.Params(maxDistMeters = 200.0, maxTimeDays = 30.0, maxNrGaps = 1),
        share = _.localCheckpoint(false))._2.count()
    }
    spark.stop()
  }
}
