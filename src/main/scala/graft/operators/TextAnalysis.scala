package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language id, quality
  * scoring, token counting, fingerprinting. Pure Catalyst expressions —
  * these run in the scan stage at 100 TB with no shuffle at all.
  */
object TextAnalysis {

  /** Tiny per-language marker dictionaries (n-gram/stopword heuristic). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private def markerHits(words: Column, markers: Seq[String]): Column =
    size(filter(words, w => markers.foldLeft(lit(false))((acc, m) => acc || (w === m))))

  /** Language-id scores + argmax prediction (ties: language name order). */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    val scored = langMarkers.toSeq.sortBy(_._1).foldLeft(docs) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang", markerHits(words, markers).cast("long"))
    }
    val langs = langMarkers.keys.toSeq.sorted
    val best = langs.tail.foldLeft((col(s"score_${langs.head}"), lit(langs.head))) {
      case ((bestScore, bestLang), l) =>
        val s = col(s"score_$l")
        (when(s > bestScore, s).otherwise(bestScore),
          when(s > bestScore, lit(l)).otherwise(bestLang))
    }
    scored.withColumn("predicted_lang", best._2)
  }

  /** Quality heuristics: length, word stats, stopword/punct/digit ratios.
    * All divisions guarded; ratios in [0,1].
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val words = split(t, " ")
    val nWords = size(words).cast("long")
    val nChars = length(t).cast("long")
    val stopHits = markerHits(words, langMarkers("en"))
    docs
      .withColumn("n_chars", nChars)
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len",
        when(nWords > 0, (nChars - (nWords - 1)).cast("double") / nWords.cast("double")).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(nWords > 0, stopHits.cast("double") / nWords.cast("double")).otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(nChars > 0,
          (nChars - length(regexp_replace(t, "[0-9]", ""))).cast("double") / nChars.cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("quality_ok",
        col("n_words") >= 5 && col("mean_word_len") >= 2.0 && col("mean_word_len") <= 12.0 &&
          col("digit_ratio") <= 0.3)
  }

  /** Token counts: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs / digit runs / single non-space symbols).
    */
  def tokenCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("ws_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long"))

  /** Document fingerprint: the k smallest word-hash hex prefixes (a
    * winnowing-style stable sketch) plus a full-text md5. The per-word
    * md5 runs on exploded rows (codegen) rather than inside a
    * higher-order transform (interpreted).
    */
  def fingerprint(docs: DataFrame, textCol: String = "text", k: Int = 4,
                  idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), md5(col(textCol)).as("md5_fp"), explode(split(col(textCol), " ")).as("_w"))
      .withColumn("_p", substring(md5(col("_w")), 1, 8))
      .groupBy(idCol)
      .agg(
        first(col("md5_fp")).as("md5_fp"),
        array_join(slice(array_sort(collect_set(col("_p"))), 1, k), "-").as("min_word_fp"))
}
