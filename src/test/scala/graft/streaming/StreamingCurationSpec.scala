package graft.streaming

import graft.SparkSpec
import graft.operators.{CorpusOps, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The curation stages that are pure scan-stage projections — quality
  * scoring, PII redaction, split assignment, stratified sampling — run
  * unchanged on a streaming DataFrame: no state, no watermark, append
  * mode. This spec pins that property (and that the results are
  * identical to the batch application), so a refactor that sneaks a
  * shuffle or an aggregation into one of them fails here before it
  * breaks an ingest topology. The stateful stages (repetition metrics,
  * dedup, data-derived rebalancing) have their own streaming twins or
  * stay batch — see StreamingDedup / StreamingNearDup.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on a mat and ran to the park with a friend", "en"),
    (2L, "x 9 9 9 9 9 9 9 9 9", "en"),
    (3L, "mail me at jo@example.com or call 555-123-4567 sometime soon today", "de"),
    (4L, "short", "de"))

  private def runStream(f: DataFrame => DataFrame, name: String): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val query = f(input.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    input.addData(docs.take(2): _*); query.processAllAvailable()
    input.addData(docs.drop(2): _*); query.processAllAvailable()
    query.stop()
    spark.table(name).collect()
  }

  test("quality filter, pii redaction, split and sampling are streaming-safe and match batch") {
    val stage: DataFrame => DataFrame = in =>
      CorpusOps.stratifiedSample(
        CorpusOps.hashSplit(
          TextAnalysis.redactPii(
            TextAnalysis.qualityScore(in).filter(col("quality_ok"))),
          salt = "graft"),
        strataCol = "lang", ratesBp = Map("en" -> 10000), defaultBp = 10000)
        .select(col("doc_id"), col("split"), (col("n_emails") + col("n_phones")).as("n_pii"), col("redacted"))

    val streamed = runStream(stage, "cur_out")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    val batch = stage(docs.toDF("doc_id", "text", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed === batch)
    assert(streamed.map(_._1).contains(1L) && !streamed.map(_._1).contains(4L),
      "quality filter must act in-stream")
    val pii = streamed.find(_._1 == 3L).get
    assert(pii._3 >= 2L && pii._4.contains("<EMAIL>"), "pii redaction must act in-stream")
  }

  test("NFC normalization, URL features and blocklist are streaming-safe and match batch") {
    val acute = 0x0301.toChar
    val dirty = Seq(
      (1L, s"Cafe$acute  menu", "en"),
      (2L, "plain text here", "en"),
      (3L, "blocked doc", "de"),
      (4L, "kept doc", "de"))
    val stage: DataFrame => DataFrame = in =>
      CorpusOps.filterBlockedHosts(
        TextAnalysis.urlFeatures(
          TextAnalysis.normalizeText(in)
            .withColumn("url", concat(
              lit("https://h"), (col("doc_id") % 2).cast("string"), lit(".example.com/p")))),
        blocked = Seq("h0.example.com"))
        .select(col("doc_id"), col("text_norm"), col("host"))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val query = stage(input.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("norm_out").outputMode("append").start()
    input.addData(dirty: _*); query.processAllAvailable()
    query.stop()
    val streamed = spark.table("norm_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val batch = stage(dirty.toDF("doc_id", "text", "lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(1L, 3L), "even ids land on the blocked host")
    val composed = 0x00E9.toChar
    val d1 = streamed.find(_._1 == 1L).get
    assert(d1._2 == s"Caf$composed menu", "NFC must compose and collapse in-stream")
  }

  test("C4 line cleaning and Gopher rules run on a stream and match batch") {
    // both operators are stateless scan-stage projections, so the same
    // call works on a streaming frame with no state or watermark
    implicit val sqlCtx = spark.sqlContext
    val pages = Seq(
      (0L, "Good long sentence with enough words here.\nshort.\n" +
        "Another fine sentence with plenty of words too!"),
      (1L, "- a\n- b\n- c"))
    val batchDf = pages.toDF("doc_id", "text")
    val batch = TextAnalysis.gopherRules(TextAnalysis.c4LineFilter(batchDf), minWords = 5L)
      .select("doc_id", "text_clean", "n_lines_kept", "c4_ok", "gopher_ok")
      .as[(Long, String, Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq

    val input = MemoryStream[(Long, String)]
    val query = TextAnalysis.gopherRules(
        TextAnalysis.c4LineFilter(input.toDF().toDF("doc_id", "text")), minWords = 5L)
      .select("doc_id", "text_clean", "n_lines_kept", "c4_ok", "gopher_ok")
      .writeStream.format("memory").queryName("c4gopher").outputMode("append").start()
    input.addData(pages: _*)
    query.processAllAvailable(); query.stop()
    val streamed = spark.table("c4gopher")
      .as[(Long, String, Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(streamed === batch, "streaming curation rules must equal batch bit-for-bit")
  }

  test("LZ76 density and duplicate-segment metrics run on a stream and match batch") {
    // both are stateless scan-stage projections (codegen'd phrase count /
    // higher-order array arithmetic) — no state, no watermark, append mode
    implicit val sqlCtx = spark.sqlContext
    val pages = Seq(
      (0L, "spam spam spam spam spam\nspam spam spam spam spam\n\nunique paragraph"),
      (1L, "varied words make longer parses\nanother different line"))
    val batchDf = pages.toDF("doc_id", "text")
    val batchLz = TextAnalysis.lzDensity(batchDf, maxChars = 120)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val batchDup = TextAnalysis.duplicateSegmentMetrics(batchDf)
      .select("doc_id", "n_dup_lines", "dup_ok")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq

    val input = MemoryStream[(Long, String)]
    val q1 = TextAnalysis.lzDensity(input.toDF().toDF("doc_id", "text"), maxChars = 120)
      .writeStream.format("memory").queryName("lzd").outputMode("append").start()
    input.addData(pages: _*); q1.processAllAvailable(); q1.stop()
    assert(spark.table("lzd").as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq == batchLz)

    val input2 = MemoryStream[(Long, String)]
    val q2 = TextAnalysis.duplicateSegmentMetrics(input2.toDF().toDF("doc_id", "text"))
      .select("doc_id", "n_dup_lines", "dup_ok")
      .writeStream.format("memory").queryName("dups").outputMode("append").start()
    input2.addData(pages: _*); q2.processAllAvailable(); q2.stop()
    assert(spark.table("dups").as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq == batchDup)
  }

  test("char entropy runs on a stream and matches batch — stateless scan projection") {
    implicit val sqlCtx = spark.sqlContext
    val pages = Seq((0L, "aaaaaaaa"), (1L, "abcdabcd"), (2L, "mixed entropy text sample"))
    val batch = TextAnalysis.charEntropy(pages.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val input = MemoryStream[(Long, String)]
    val q = TextAnalysis.charEntropy(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("entro").outputMode("append").start()
    input.addData(pages: _*); q.processAllAvailable(); q.stop()
    assert(spark.table("entro").as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq == batch)
  }

  test("scan-only DSIR scoring runs on a stream and matches batch scores") {
    // the weight table is trained in batch (bounded dim-row driver
    // state); scoring is a stateless per-row projection, so the same
    // operator runs on a streaming frame with no state, watermark, or
    // output-mode concern
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((0L, "a b a c"), (1L, "a b"), (2L, "c d c d"), (3L, "x y"))
      .toDF("doc_id", "text")
    val w = TextAnalysis.importanceWeights(corpus.filter(col("doc_id") < 2), corpus, 64)
    val batch = TextAnalysis.importanceScoreScan(corpus, w, 64)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

    val input = MemoryStream[(Long, String)]
    val query = TextAnalysis.importanceScoreScan(input.toDF().toDF("doc_id", "text"), w, 64)
      .writeStream.format("memory").queryName("dsirscan").outputMode("append").start()
    input.addData((0L, "a b a c"), (1L, "a b"), (2L, "c d c d"), (3L, "x y"))
    query.processAllAvailable(); query.stop()
    val streamed = spark.table("dsirscan")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed === batch, "streaming scores must equal batch bit-for-bit")
  }

  test("winnowing fingerprints run on a stream and match batch selections") {
    val stage: DataFrame => DataFrame = in =>
      TextAnalysis.winnowFingerprints(in, k = 3, w = 4)
    val streamed = runStream(stage, "winnow_out")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = stage(docs.toDF("doc_id", "text", "lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.map(_._1).size > 2, "multi-doc selections must survive the stream")
  }

  test("per-host ingest caps compose from urlFeatures + StreamingQuota keyed by host") {
    // the streaming twin of CorpusOps.capPerHost for ingest topologies:
    // host extraction is scan-stage, so StreamingQuota's keyed counter
    // runs directly on the derived host column
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val withHost = (in: DataFrame) => TextAnalysis.urlFeatures(
      in.toDF("doc_id", "url", "t_us"))
    val query = StreamingQuota.quota(withHost(input.toDF()), quota = 2,
      windowMinutes = 60, groupCol = "host", idleHorizonMinutes = 0)
      .writeStream.format("memory").queryName("hostquota").outputMode("append").start()
    val rows = (0L until 6L).map(i =>
      (i, s"https://h${i % 2}.example.com/p$i", i * 1000L))
    input.addData(rows: _*); query.processAllAvailable()
    query.stop()
    val admitted = spark.table("hostquota").collect().map(_.getAs[Long]("doc_id")).toSet
    // 2 per host in the window: h0 gets 0,2; h1 gets 1,3; 4 and 5 are over quota
    assert(admitted === Set(0L, 1L, 2L, 3L))
  }
}
