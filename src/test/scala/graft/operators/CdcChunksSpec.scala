package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, maskBits: Int = 3): Seq[(Long, String)] = {
    CorpusOps.cdcChunks(Seq((0L, text)).toDF("doc_id", "text"), k = 2, maskBits = maskBits)
      .select("chunk_index", "chunk_text").as[(Long, String)].collect().sortBy(_._1).toSeq
  }

  test("chunks partition the document in order") {
    val text = (0 until 200).map(i => s"w${i % 37}").mkString(" ")
    val got = chunksOf(text)
    assert(got.map(_._2).mkString(" ") == text) // lossless, ordered
    assert(got.map(_._1) == got.indices.map(_.toLong)) // dense chunk ids
    assert(got.size > 5, s"expected multiple chunks, got ${got.size}") // mask 3 -> ~8-word chunks
  }

  test("boundaries are content-defined: head insertion leaves the tail chunks intact") {
    val base = (0 until 300).map(i => s"t${(i * 13 + i * i * 7) % 997}").mkString(" ")
    val edited = "inserted words here " + base
    val a = chunksOf(base).map(_._2)
    val b = chunksOf(edited).map(_._2)
    // every chunk after the first cut downstream of the edit reappears
    // verbatim: the common suffix covers all but the head chunk
    val suffix = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(suffix >= a.size - 2, s"common suffix $suffix of ${a.size} chunks")
    // the fixed-window chunker, by contrast, shifts every chunk boundary
    def fixed(t: String) = CorpusOps.chunkDocuments(
      Seq((0L, t)).toDF("doc_id", "text"), chunkTokens = 8)
      .orderBy("chunk_index").select("chunk_text").as[String].collect().toSeq
    val (fa, fb) = (fixed(base), fixed(edited))
    val fixedSuffix = fa.reverse.zip(fb.reverse).takeWhile { case (x, y) => x == y }.length
    assert(fixedSuffix < suffix, s"fixed-window suffix $fixedSuffix vs cdc $suffix")
  }

  test("expected chunk length tracks 2^maskBits") {
    val text = (0 until 2000).map(i => s"v${(i * 31) % 997}").mkString(" ")
    val got = chunksOf(text, maskBits = 4)
    val mean = 2000.0 / got.size
    assert(mean > 8 && mean < 32, s"mean chunk length $mean for maskBits=4 (expect ~16)")
  }
}
