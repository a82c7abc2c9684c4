package graft.operators

import graft.SparkSpec

/** [[Classifier]] — integer hashed-BoW linear classifier. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference twin of [[Classifier.fit]]: same hashing,
    * same scaled-integer hard-sigmoid gradient descent, plain Scala
    * collections — an independent implementation of the contract, not a
    * re-run of the operator.
    */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def referenceFit(docs: Seq[(Long, String, Long)], dim: Int, iters: Int,
                           stepDiv: Long): Array[Long] = {
    val feats: Seq[(Long, Map[Long, Long])] = docs.map { case (id, text, _) =>
      val counts = text.split(" ").filter(_.nonEmpty)
        .groupBy(w => h60(w) % dim).map { case (b, ws) => b -> ws.length.toLong }
      id -> (counts + (dim.toLong -> (counts.getOrElse(dim.toLong, 0L) + 1L)))
    }
    val y = docs.map(d => d._1 -> d._3).toMap
    val w = Array.fill(dim + 1)(0L)
    val S = Classifier.S
    val PS = Classifier.PS
    for (_ <- 1 to iters) {
      val g = Array.fill(dim + 1)(0L)
      feats.foreach { case (id, x) =>
        val z = x.map { case (b, v) => w(b.toInt) * v }.sum
        val p = math.max(0L, math.min(z + 2 * S, PS))
        val e = p - y(id) * PS
        x.foreach { case (b, v) => g(b.toInt) += e * v }
      }
      for (b <- 0 to dim) w(b) -= Math.floorDiv(g(b), stepDiv)
    }
    w
  }

  private val labeled = Seq(
    (1L, "good great fine good solid", 1L),
    (2L, "great good nice fine", 1L),
    (3L, "good good great", 1L),
    (4L, "bad awful poor bad broken", 0L),
    (5L, "awful bad poor junk", 0L),
    (6L, "bad bad awful", 0L))

  test("fit separates a separable fixture and score classifies it") {
    val docs = labeled.toDF("doc_id", "text", "label")
    val w = Classifier.fit(docs, dim = 256, iters = 8, stepDiv = 1024L)
    val scored = Classifier.score(docs, w, dim = 256)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    labeled.foreach { case (id, _, y) =>
      assert(scored(id)._2 == y, s"doc $id must classify as $y: $scored")
    }
    // positive-word buckets above negative-word buckets
    val bGood = (h60("good") % 256).toInt
    val bBad = (h60("bad") % 256).toInt
    assert(w(bGood) > 0 && w(bBad) < 0,
      s"w(good)=${w(bGood)} must be > 0 > w(bad)=${w(bBad)}")
  }

  test("fit equals the driver-side reference twin exactly") {
    val docs = labeled.toDF("doc_id", "text", "label")
    val got = Classifier.fit(docs, dim = 64, iters = 5, stepDiv = 2048L)
    val want = referenceFit(labeled, dim = 64, iters = 5, stepDiv = 2048L)
    assert(got.toSeq == want.toSeq)
  }

  test("fit is partitioning-invariant (long sums, no float order)") {
    val docs = labeled.toDF("doc_id", "text", "label")
    val w1 = Classifier.fit(docs.repartition(1), dim = 64, iters = 4, stepDiv = 4096L)
    val w7 = Classifier.fit(docs.repartition(7), dim = 64, iters = 4, stepDiv = 4096L)
    assert(w1.toSeq == w7.toSeq)
  }

  test("empty documents carry only the bias feature and still score") {
    val docs = Seq((1L, "", 0L), (2L, "good", 1L)).toDF("doc_id", "text", "label")
    val w = Classifier.fit(docs, dim = 16, iters = 2, stepDiv = 512L)
    val out = Classifier.score(docs, w, dim = 16).collect()
    assert(out.length == 2, "empty doc must not vanish from scoring")
  }

  test("calibration: buckets partition the corpus; observed and predicted are exact ratios") {
    val docs = labeled.toDF("doc_id", "text", "label")
    val cal = Classifier.calibration(docs, dim = 256, iters = 8, stepDiv = 1024L, buckets = 4)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("sum_p_q"),
        r.getAs[Double]("observed"), r.getAs[Double]("predicted")))
    assert(cal.map(_._2).sum == labeled.size.toLong) // buckets partition all docs
    assert(cal.forall(c => c._1 >= 0L && c._1 <= 3L))
    cal.foreach { c =>
      assert(c._5 == c._3.toDouble / c._2.toDouble, s"observed mismatch: $c")
      assert(c._6 == c._4.toDouble / (c._2.toDouble * Classifier.PS.toDouble), s"predicted: $c")
    }
    // a separable fixture calibrates at the extremes: the top bucket is
    // all positives, the bottom all negatives
    val byBucket = cal.map(c => c._1 -> c).toMap
    assert(byBucket(cal.map(_._1).max)._5 == 1.0)
    assert(byBucket(cal.map(_._1).min)._5 == 0.0)
  }

  test("aucEval: separable fixture scores AUC 1.0 with exact U-statistic") {
    val docs = labeled.toDF("doc_id", "text", "label")
    val r = Classifier.aucEval(docs, dim = 256, iters = 8, stepDiv = 1024L).collect().head
    val (nPos, nNeg) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    assert((nPos, nNeg) == ((3L, 3L)))
    // perfectly separated: every positive outranks every negative —
    // U2 = 2·n_pos·n_neg exactly, AUC exactly 1.0
    assert(r.getAs[java.math.BigDecimal]("u2").longValueExact() == 2L * nPos * nNeg)
    assert(r.getAs[Double]("auc") == 1.0)
  }

  test("aucEval: identical texts with mixed labels tie every score — AUC exactly 0.5") {
    val docs = (0 until 8).map(i => (i.toLong, "same words here", (i % 2).toLong))
      .toDF("doc_id", "text", "label")
    val r = Classifier.aucEval(docs, dim = 64, iters = 4, stepDiv = 1024L).collect().head
    // one tie group: U2 = n_pos·n_neg (ties count half, doubled)
    assert(r.getAs[java.math.BigDecimal]("u2").longValueExact() == 16L)
    assert(r.getAs[Double]("auc") == 0.5)
  }

  test("scoreDrift: mirrored halves score PSI exactly 0; disjoint halves drift positive") {
    // ids 2i and 2i+1 share text -> per-bucket counts identical -> psi_num = 0
    val mirrored = (0 until 12).flatMap { i =>
      val t = if (i % 2 == 0) "good great fine" else "bad awful poor"
      Seq((2L * i, t, (i % 2).toLong), (2L * i + 1, t, (i % 2).toLong))
    }.toDF("doc_id", "text", "label")
    val r0 = Classifier.scoreDrift(mirrored, dim = 256, iters = 8, stepDiv = 1024L).collect().head
    assert(r0.getAs[java.math.BigDecimal]("psi_num").longValueExact() == 0L)
    assert(r0.getAs[Double]("psi") == 0.0)
    // overlapping but shifted mixes: even ids 8:4 positive-text, odd ids
    // 4:8 — hand value 2·(1/3)·ln 2 ≈ 0.462 (disjoint halves would all
    // be skipped buckets, which is why the monitor reports that count)
    val drifted = (0 until 24).map { i =>
      val pos = if (i % 2 == 0) i % 3 != 0 else i % 3 == 0
      (i.toLong, if (pos) "good great fine" else "bad awful poor", if (pos) 1L else 0L)
    }.toDF("doc_id", "text", "label")
    val r1 = Classifier.scoreDrift(drifted, dim = 256, iters = 8, stepDiv = 1024L).collect().head
    assert(r1.getAs[Double]("psi") > 0.3, s"psi ${r1.getAs[Double]("psi")}")
    assert(r1.getAs[Long]("n_buckets_used") >= 2L)
  }

  test("clusterSizeHistogram: chain and pair reduce to (size -> count) rows") {
    import spark.implicits._
    // component {1,2,3} (size 3) and {10,11} (size 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.clusterSizeHistogram(pairs).collect()
      .map(r => r.getAs[Long]("size") -> r.getAs[Long]("n_clusters")).toMap
    assert(out == Map(3L -> 1L, 2L -> 1L))
  }
}
