package graft.operators

import graft.SparkSpec
import graft.plans.CharGramHashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Pins the r16 substringPairs rewrite (rolling-hash prefilter +
  * survivor-only substring derivation) to the operator's contract:
  * the prefilter is a pure candidate-ADMISSION stage, so the output
  * must be identical to a prefilter-free raw-string implementation
  * for ANY hash function — including one seeded with collisions.
  */
class SubstringPairsSpec extends SparkSpec {
  import spark.implicits._

  private val minLen = 12
  private val maxDf = 4

  /** Prefilter-free reference: the raw-string gram pipeline with no
    * hash anywhere — the operator's semantic definition.
    */
  private def reference(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), col("text").as("_t"))
      .filter(length(col("_t")) >= minLen)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(_t) - ${minLen - 1}), i -> substring(_t, i, $minLen))"))
        .as("gram"))
    val cand = grams.distinct()
    val pairable = cand.groupBy(col("gram")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= maxDf).select(col("gram"))
    val kept = cand.join(pairable, Seq("gram"))
    kept.select(col("gram"), col("doc_id").as("_a"))
      .join(kept.select(col("gram"), col("doc_id").as("_b")), Seq("gram"))
      .filter(col("_a") < col("_b"))
      .groupBy(col("_a").as("doc_id_1"), col("_b").as("doc_id_2"))
      .agg(count(lit(1)).cast("long").as("n_shared_grams"))
  }

  private def fixture: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "xx the quick brown fox sleeps under the lazy dog yy"),
    (3L, "the quick brown fox jumps over the lazy dog"), // verbatim clone of 1
    (4L, "completely unrelated text with no shared runs at all"),
    (5L, "boilerplate boilerplate boilerplate boilerplate"),
    (6L, "zz boilerplate boilerplate boilerplate boilerplate"),
    (7L, "short"), // below minLen: must not appear anywhere
    (8L, "the quick brown fox jumps over---different tail here")
  ).toDF("doc_id", "text")

  private def sorted(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("doc_id_1"), col("doc_id_2"), col("n_shared_grams"))
      .as[(Long, Long, Long)].collect().sorted.toSeq

  test("rewritten operator equals the prefilter-free raw-string reference") {
    val got = sorted(Dedup.substringPairs(fixture, minLen, maxDf))
    val want = sorted(reference(fixture))
    assert(want.nonEmpty, "fixture must produce pairs or the test is vacuous")
    assert(got == want)
  }

  test("a collision-flooding prefilter hash cannot change the output") {
    // every gram hash collapsed mod 4: massive deliberate collisions —
    // the prefilter admits nearly everything, and the raw-string
    // df/distinct/self-join stages must still produce the exact output
    val colliding: Column => Column = t =>
      transform(
        ColumnShim.column(CharGramHashes(ColumnShim.expression(t), minLen)),
        h => pmod(h, lit(4L)))
    val got = sorted(Dedup.substringPairsWithPrefilter(
      fixture, minLen, maxDf, "doc_id", "text", identity, colliding))
    assert(got == sorted(reference(fixture)))
  }

  test("rolling gram hashes equal the direct per-window recompute") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde é世" // includes multi-byte code points
    val texts = Seq.fill(50)(
      (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val n = 5
    def direct(s: String): Seq[Long] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - n).map { i =>
        var h = 0L
        (0 until n).foreach(k => h = h * 0x9E3779B97F4A7C15L + cps(i + k))
        h
      }
    }
    val got = texts.toDF("t")
      .select(col("t"),
        ColumnShim.column(CharGramHashes(ColumnShim.expression(col("t")), n)).as("hs"))
      .as[(String, Seq[Long])].collect()
    got.foreach { case (s, hs) =>
      assert(hs == direct(s), s"rolling != direct for '$s'")
    }
  }

  test("equal substring windows always share a hash (superset property)") {
    val s = "abcabcabcabc"
    val n = 3
    val hs = Seq(s).toDF("t")
      .select(ColumnShim.column(CharGramHashes(ColumnShim.expression(col("t")), n)).as("hs"))
      .as[Seq[Long]].head()
    val windows = (0 to s.length - n).map(i => s.substring(i, i + n))
    windows.zipWithIndex.combinations(2).foreach { case Seq((wa, ia), (wb, ib)) =>
      if (wa == wb) assert(hs(ia) == hs(ib), s"equal windows $wa at $ia/$ib hash apart")
    }
  }

  test("null and short inputs: null -> null, shorter than n -> empty array") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "ab"), (3L, "abc"))
      .toDF("id", "t")
      .select(col("id"),
        ColumnShim.column(CharGramHashes(ColumnShim.expression(col("t")), 3)).as("hs"))
      .collect().sortBy(_.getLong(0))
    assert(df(0).isNullAt(1))
    assert(df(1).getSeq[Long](1).isEmpty)
    assert(df(2).getSeq[Long](1).length == 1)
  }
}
