package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for [[CorpusOps.chunkDocuments]]: coverage, overlap,
  * and reconstruction invariants over random (seeded) corpora and chunk
  * geometries, checked against a straightforward sequential reference.
  */
class ChunkPropertySpec extends SparkSpec {
  import spark.implicits._

  private def refChunks(words: Seq[String], chunk: Int, overlap: Int): Seq[(Long, Seq[String])] = {
    val stride = chunk - overlap
    if (words.isEmpty) Seq.empty
    else (0 to (words.length - 1) / stride).map { k =>
      (k.toLong, words.slice(k * stride, k * stride + chunk))
    }
  }

  private val genCase: Gen[(Seq[Seq[String]], Int, Int)] = for {
    nDocs <- Gen.choose(1, 8)
    docs <- Gen.listOfN(nDocs, for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, Gen.choose('a', 'z').map(c => s"$c${n % 7}"))
    } yield ws)
    chunk <- Gen.choose(1, 12)
    overlap <- Gen.choose(0, chunk - 1)
  } yield (docs.map(_.toSeq), chunk, overlap)

  test("chunking matches the sequential reference on random corpora (100 cases)") {
    val params = Gen.Parameters.default
    (0 until 100).foreach { i =>
      val (docs, chunk, overlap) = genCase.pureApply(params, Seed(i.toLong))
      val df = docs.zipWithIndex
        .map { case (ws, id) => (id.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = CorpusOps.chunkDocuments(df, chunk, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)

      docs.zipWithIndex.foreach { case (ws, id) =>
        val expect = refChunks(ws, chunk, overlap)
        val actual = got.getOrElse(id.toLong, Array.empty).sortBy(_._2)
          .map(c => (c._2, c._4.split(" ").toSeq.filter(_.nonEmpty))).toSeq
        assert(actual == expect,
          s"seed $i doc $id (n=${ws.length}, chunk=$chunk, overlap=$overlap):\n$actual\nvs\n$expect")
        // invariants: n_tokens column is consistent; every token covered
        actual.foreach { case (k, c) =>
          assert(c.length <= chunk && (c.nonEmpty || ws.isEmpty))
          val all = got(id.toLong).find(_._2 == k).get
          assert(all._3 == c.length, s"n_tokens mismatch at chunk $k")
        }
        if (ws.nonEmpty)
          assert(actual.flatMap(_._2).toSet == ws.toSet, "every token must be covered")
      }
    }
  }
}
