package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool (r16 optimization round): per-stage wall-clock breakdown of
  * the suite's most expensive gates, so optimization targets the stage
  * that actually costs (guide §1 "measure first"). Each mode times the
  * operator's internal stages with separate actions on a warm JVM —
  * `runMain graft.R16Probe dedup|colo|classifier [sfDir]`.
  */
object R16Probe {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }
  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("dedup")
    val dir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    // warm the scheduler/codegen paths like Bench does
    spark.range(1000000).groupBy((col("id") % 7).as("k")).count().count()

    (1 to sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt).foreach { run =>
      println(s"[probe] === $mode run $run ===")
      Pipeline.reset()
      mode match {
        case "dedup" => dedupStages(spark, dir)
        case "dedup2" => dedupStagesNew(spark, dir)
        case "dedup3" =>
          val docs = spark.read.parquet(s"$dir/documents.parquet")
          t("substringPairs share=localCheckpoint")(force(
            operators.Dedup.substringPairs(docs, 40, 100, share = _.localCheckpoint(false))))
          t("substringPairs share=identity")(force(
            operators.Dedup.substringPairs(docs, 40, 100)))
          t("substringPairs share=eager ckpt")(force(
            operators.Dedup.substringPairs(docs, 40, 100, share = _.localCheckpoint(true))))
          t("substringPairs share=identity (again)")(force(
            operators.Dedup.substringPairs(docs, 40, 100)))
        case "dedupplan" =>
          // full-tree formatted plans (share = identity, so no
          // checkpoint truncates the view): the committed
          // plans/r16/dedup_substring_fullplan_{before,after}.txt
          val docs = spark.read.parquet(s"$dir/documents.parquet")
          println("=== BEFORE (r15 shape, reconstructed verbatim) ===")
          dedupOldShape(docs).explain("formatted")
          println("=== AFTER (rolling-hash prefilter + repartitioned scan) ===")
          operators.Dedup.substringPairs(docs, 40, 100).explain("formatted")
        case "colo" => coloStages(spark, dir)
        case "colojoin" =>
          val iv = graft.sources.EventsAdapter.intervals(spark, dir)
          val m = operators.SpatialOps.colocationMeetings(iv, 10000L, 120.0)
          t("meetings join as shipped (noop)")(force(m))
          val prev = spark.conf.get("spark.sql.join.preferSortMergeJoin", "true")
          spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
          t("meetings join SHJ-preferred (noop)")(force(
            operators.SpatialOps.colocationMeetings(iv, 10000L, 120.0)))
          spark.conf.set("spark.sql.join.preferSortMergeJoin", prev)
          t("meetings join as shipped again (noop)")(force(m))
        case "coloskew" =>
          // candidate-volume skew per (cx, cy, band) join key: n_a*n_b is
          // the reduce-side pair work AQE cannot see (it splits on input)
          val iv = graft.sources.EventsAdapter.intervals(spark, dir)
          val bandUs = (120.0 * 60e6).toLong
          def cell(c: org.apache.spark.sql.Column) =
            floor(floor(c * 1e6 + lit(0.5)).cast("long").cast("double") / 10000.0).cast("long")
          val keyed = iv.select(cell(col("lon")).as("cx"), cell(col("lat")).as("cy"),
            explode(sequence(
              floor(col("s_us") / lit(bandUs.toDouble)).cast("long"),
              floor(greatest(col("f_us") - 1, col("s_us")) / lit(bandUs.toDouble)).cast("long")))
              .as("band"))
          val g = keyed.groupBy("cx", "cy", "band").agg(count(lit(1)).as("n"))
            .select(col("n"), (col("n") * col("n")).as("n2"))
          g.agg(sum(col("n2")).as("total_pairwork"), max(col("n2")).as("max_key_pairwork"),
            count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows")).show(false)
          g.orderBy(col("n2").desc).show(10, false)
        case "classifier" => classifierStages(spark, dir)
        case other => sys.error(s"unknown probe mode '$other'")
      }
    }
    spark.stop()
  }

  /** The substringPairs stages, replicated from Dedup.substringPairs
    * (minLen 40, maxDf 100) with a separate action per stage.
    */
  private def dedupStages(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val minLen = 40
    val maxDf = 100
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val grams = docs
      .select(col("doc_id"), col("text").as("_t"))
      .filter(length(col("_t")) >= minLen)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(_t) - ${minLen - 1}), i -> substring(_t, i, $minLen))"))
        .as("gram"))
      .withColumn("_h", xxhash64(col("gram")))
      .localCheckpoint(false)
    t("grams explode+checkpoint")(force(grams))
    val hot = grams.groupBy(col("_h")).agg(count(lit(1)).as("_hdf"))
      .filter(col("_hdf") >= 2).select(col("_h"))
    t("hot hash prefilter (count)")(println(s"[probe]   hot=${hot.count()}"))
    val cand = grams.join(hot, Seq("_h"))
      .select(col("doc_id"), col("gram")).distinct().localCheckpoint(false)
    t("cand join+distinct+checkpoint")(force(cand))
    val pairable = cand.groupBy(col("gram"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= maxDf)
      .select(col("gram"))
    val kept = cand.join(pairable, Seq("gram")).localCheckpoint(false)
    t("pairable+kept checkpoint")(force(kept))
    val out = kept.select(col("gram"), col("doc_id").as("_a"))
      .join(kept.select(col("gram"), col("doc_id").as("_b")), Seq("gram"))
      .filter(col("_a") < col("_b"))
      .groupBy(col("_a").as("doc_id_1"), col("_b").as("doc_id_2"))
      .agg(count(lit(1)).cast("long").as("n_shared_grams"))
    t("self-join+pair agg")(force(out))
    t("TOTAL (operator as shipped)")(force(
      operators.Dedup.substringPairs(docs, minLen = 40, maxDf = 100,
        share = _.localCheckpoint(false))))
  }

  /** The r15 substringPairs pipeline, verbatim (identity share), for
    * the before-plan dump and stage timing.
    */
  private def dedupOldShape(docs: DataFrame): DataFrame = {
    val minLen = 40
    val maxDf = 100
    val grams = docs
      .select(col("doc_id"), col("text").as("_t"))
      .filter(length(col("_t")) >= minLen)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(_t) - ${minLen - 1}), i -> substring(_t, i, $minLen))"))
        .as("gram"))
      .withColumn("_h", xxhash64(col("gram")))
    val hot = grams.groupBy(col("_h")).agg(count(lit(1)).as("_hdf"))
      .filter(col("_hdf") >= 2).select(col("_h"))
    val cand = grams.join(hot, Seq("_h"))
      .select(col("doc_id"), col("gram")).distinct()
    val pairable = cand.groupBy(col("gram"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= maxDf)
      .select(col("gram"))
    val kept = cand.join(pairable, Seq("gram"))
    kept.select(col("gram"), col("doc_id").as("_a"))
      .join(kept.select(col("gram"), col("doc_id").as("_b")), Seq("gram"))
      .filter(col("_a") < col("_b"))
      .groupBy(col("_a").as("doc_id_1"), col("_b").as("doc_id_2"))
      .agg(count(lit(1)).cast("long").as("n_shared_grams"))
  }

  /** The REWRITTEN substringPairs stages (rolling-hash prefilter). */
  private def dedupStagesNew(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.graftshim.ColumnShim
    val minLen = 40
    val maxDf = 100
    def gh(t: org.apache.spark.sql.Column) = ColumnShim.column(
      graft.plans.CharGramHashes(ColumnShim.expression(t), minLen))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.select(col("doc_id"), col("text").as("_t"))
      .filter(length(col("_t")) >= minLen)
    t("hash explode only (noop)")(force(base.select(explode(gh(col("_t"))).as("_h"))))
    val hot = base.select(explode(gh(col("_t"))).as("_h"))
      .groupBy(col("_h")).agg(count(lit(1)).as("_hdf"))
      .filter(col("_hdf") >= 2).select(col("_h"))
    t("hot rolling-hash prefilter (count)")(println(s"[probe]   hot=${hot.count()}"))
    val cand = base
      .select(col("doc_id"), col("_t"), posexplode(gh(col("_t"))).as(Seq("_i", "_h")))
      .join(hot, Seq("_h"))
      .select(col("doc_id"), expr(s"substring(_t, _i + 1, $minLen)").as("gram"))
      .distinct().localCheckpoint(false)
    t("cand posexplode+join+distinct+ckpt")(force(cand))
    val pairable = cand.groupBy(col("gram"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= maxDf)
      .select(col("gram"))
    val kept = cand.join(pairable, Seq("gram")).localCheckpoint(false)
    t("pairable+kept checkpoint")(force(kept))
    val out = kept.select(col("gram"), col("doc_id").as("_a"))
      .join(kept.select(col("gram"), col("doc_id").as("_b")), Seq("gram"))
      .filter(col("_a") < col("_b"))
      .groupBy(col("_a").as("doc_id_1"), col("_b").as("doc_id_2"))
      .agg(count(lit(1)).cast("long").as("n_shared_grams"))
    t("self-join+pair agg")(force(out))
    t("TOTAL (operator as shipped)")(force(
      operators.Dedup.substringPairs(docs, minLen = 40, maxDf = 100,
        share = _.localCheckpoint(false))))
  }

  private def coloStages(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.sources.EventsAdapter
    val iv = EventsAdapter.intervals(spark, dir)
    t("intervals scan")(force(iv))
    val meetRaw = operators.SpatialOps.colocationMeetings(iv, 10000L, 120.0)
    t("meetings join (noop, no ckpt)")(force(meetRaw))
    val meet = t("meetings checkpoint build") {
      val m = meetRaw.localCheckpoint(false); force(m); m
    }
    val pairs = t("pairs agg from ckpt (ckpt build)") {
      val p = operators.SpatialOps.colocationPairsFromMeetings(meet).localCheckpoint(false)
      force(p); p
    }
    t("contactGraph from pairs") {
      val g = operators.SpatialOps.contactGraph(pairs, _.localCheckpoint(false))
      force(g.edgesW); force(g.degW); force(g.degU)
    }
    t("prolog census over edgesW (memoized path)") {
      val g2 = Pipeline.contactGraph(spark, dir)
      force(g2.edgesW.agg(
        countDistinct(col("src")).cast("long").as("n_nodes"),
        count(lit(1)).cast("long").as("n_edges"),
        sum(col("w")).cast("long").as("total_w")))
    }
  }

  private def classifierStages(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    t("classifierWeights4 (4-iter fit)") {
      Pipeline.classifierWeights4(spark, dir)
    }
    t("scoredDocs (8-iter trainAndScore)") {
      force(Pipeline.scoredDocs(spark, dir))
    }
    t("classifier_score read (marginal)") {
      force(operators.Classifier.score(Pipeline.labeledDocs(spark, dir),
        Pipeline.classifierWeights4(spark, dir), dim = 64))
    }
  }
}
