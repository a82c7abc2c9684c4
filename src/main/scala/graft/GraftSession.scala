package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory: every entry point (Verify, Bench, tests)
  * funnels through here so tuning lives in one place.
  *
  * Scale notes (targets a 1000-executor cluster even though we test on
  * local[32]):
  *  - AQE stays on (Spark 4 default) for runtime shuffle coalescing and
  *    skew-join splitting.
  *  - `spark.sql.shuffle.partitions` is a *default*; on a real cluster it
  *    should be ~2-3x the executor-core count. Local runs pass 32.
  *  - `nanosAsLong` because the driver's events.parquet carries
  *    TIMESTAMP(NANOS) which Spark's vectorized reader otherwise rejects;
  *    we convert to micros explicitly (see sources.EventsAdapter).
  */
object GraftSession {
  def configure(builder: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    builder
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // InferFiltersFromGenerate re-evaluates the generator's child
      // expression inside an inferred pre-filter; for our sketch
      // operators that child is an expensive interpreted higher-order
      // lambda (shingling, tokenizing), so the inferred filter doubles
      // the most expensive projection. Generate already skips null/empty
      // inputs, so dropping the rule is semantics-preserving.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 4): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      shufflePartitions = math.max(cores, 4)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Make an externally-created session safe for graft operators. */
  def prepare(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.plans.GraftExtensions.register(spark)
    spark
  }
}
