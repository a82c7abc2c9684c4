package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All operators are shaped for
  * the 100 TB path: candidate generation is always a *bucket equi-join*
  * (shuffle on a small key), never an all-pairs product; exact similarity
  * is computed only on candidates.
  */
object Dedup {

  // shiftleft/shiftright take Int amounts in the Scala DSL; these accept
  // Column amounts (x * 2^n / x div 2^n on non-negative domains)
  private def shiftleftc(x: Column, n: Column): Column = expr_shift(x, n, left = true)
  private def shiftrightc(x: Column, n: Column): Column = expr_shift(x, n, left = false)
  private def expr_shift(x: Column, n: Column, left: Boolean): Column = {
    val p = pow(lit(2.0), n).cast("long")
    if (left) x * p else floor(x.cast("double") / p).cast("long")
  }

  /** Exact dedup on normalized text: keep the smallest id per group.
    * One hash-groupBy — map-side combinable, single shuffle.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("_h", md5(col(textCol)))
      .groupBy(col("_h").as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Word shingles (n-grams joined by space), distinct per doc. */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(textCol, " ")
    array_distinct(when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", words))))
  }

  /** MinHash signatures + LSH banding.
    *
    * Pipeline: shingle → per-shingle 64-bit hash (xxhash64 with per-
    * function seed) → signature = min hash per function → band r rows →
    * candidate pairs join on (band index, band hash). Everything is
    * higher-order Catalyst expressions until the final pair join; the
    * join key (band, bandHash) is small and hash-distributable. Exact
    * Jaccard over shingle sets verifies candidates.
    *
    * @return pair table (id_a, id_b, est_sim, jaccard) with id_a < id_b
    */
  def minHashLsh(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                 verifyThreshold: Double = 0.0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    val withShingles = docs.select(col(idCol).as("_id"), shingles(col(textCol), shingleN).as("_sh"))

    // signature[i] = min over shingles of xxhash64(shingle, seed=i)
    val sig = withShingles.withColumn("_sig",
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(col("_sh"), s => xxhash64(s, i)))))

    // band hashes: hash of each r-slice of the signature
    val banded = sig.withColumn("_band", explode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("b"), xxhash64(concat_ws(",", slice(col("_sig"), b * rows + 1, lit(rows))), b).as("h")))))
      .select(col("_id"), col("_sh"), col("_band.b").as("_b"), col("_band.h").as("_h"))

    // candidate pairs: same band, same band-hash
    val left = banded.select(col("_b"), col("_h"), col("_id").as("id_a"), col("_sh").as("_sh_a"))
    val right = banded.select(col("_b"), col("_h"), col("_id").as("id_b"), col("_sh").as("_sh_b"))
    val pairs = left.join(right, Seq("_b", "_h")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("jaccard",
        size(array_intersect(col("_sh_a"), col("_sh_b"))).cast("double") /
          size(array_union(col("_sh_a"), col("_sh_b"))).cast("double"))
      .filter(col("jaccard") >= verifyThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash fingerprint per document: sum ±1 per bit over token
    * hashes, weighted by token count. Near-dup candidates share one of
    * four 16-bit chunks (catches all pairs within Hamming distance 3).
    */
  def simHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tokens = split(col(textCol), " ")
    // per-bit vote: for each of 64 bits, sum over tokens of +1/-1
    val bitVotes = transform(sequence(lit(0), lit(63)), b =>
      aggregate(tokens, lit(0L),
        (acc, t) => acc + when(shiftrightc(xxhash64(t), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)))
    docs.select(col(idCol).as("doc_id"),
      aggregate(
        zip_with(bitVotes, sequence(lit(0), lit(63)), (v, b) => when(v > 0, shiftleftc(lit(1L), b)).otherwise(0L)),
        lit(0L), (acc, x) => acc.bitwiseOR(x)).as("simhash"))
  }

  /** Near-dup pairs by SimHash: bucket on 16-bit chunks, verify Hamming
    * distance <= maxHamming via bit_count.
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = simHash(docs, idCol, textCol)
    val chunked = fp.withColumn("_c", explode(transform(sequence(lit(0), lit(3)),
      c => struct(c.as("c"),
        (shiftrightc(col("simhash"), c * 16).bitwiseAND(0xFFFFL)).as("h")))))
      .select(col("doc_id"), col("simhash"), col("_c.c").as("_chunk"), col("_c.h").as("_h"))
    val l = chunked.select(col("_chunk"), col("_h"), col("doc_id").as("id_a"), col("simhash").as("_f_a"))
    val r = chunked.select(col("_chunk"), col("_h"), col("doc_id").as("id_b"), col("simhash").as("_f_b"))
    l.join(r, Seq("_chunk", "_h")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("_f_a").bitwiseXOR(col("_f_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity of each probe document against a
    * corpus, returning the top-1 match per probe. Probes × corpus is
    * bounded by broadcasting the (small) probe set.
    */
  def ngramJaccardTop1(probes: DataFrame, corpus: DataFrame, shingleN: Int = 3,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), shingles(col(textCol), shingleN).as("_sh_p"))
    val c = corpus.select(col(idCol).as("match_id"), shingles(col(textCol), shingleN).as("_sh_c"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("match_id"))
      .withColumn("jaccard",
        size(array_intersect(col("_sh_p"), col("_sh_c"))).cast("double") /
          size(array_union(col("_sh_p"), col("_sh_c"))).cast("double"))
    val w = Window.partitionBy("probe_id").orderBy(col("jaccard").desc, col("match_id"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("probe_id"), col("match_id"), col("jaccard"))
  }

  /** Embedding near-duplicates: cosine similarity >= threshold among
    * candidate pairs from random-hyperplane LSH buckets (see Ann for the
    * signature machinery).
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double = 0.95, planes: Int = 16,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = Ann.hyperplaneSignature(emb, planes, idCol, vecCol)
    val l = sig.select(col("_sig").as("_s"), col(idCol).as("id_a"), col("_v").as("_v_a"))
    val r = sig.select(col("_sig").as("_s"), col(idCol).as("id_b"), col("_v").as("_v_b"))
    l.join(r, Seq("_s")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Ann.cosine(col("_v_a"), col("_v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
