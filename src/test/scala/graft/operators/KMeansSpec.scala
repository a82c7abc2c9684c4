package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, when}

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def embDf(vs: Seq[(Long, Seq[Float])]): DataFrame =
    vs.toDF("vec_id", "embedding")

  test("two separated blobs: centroids land on the blob means") {
    // blob A around (0, 0), blob B around (10, 10); seeds are ids 0 and 1
    // (one from each blob), so Lloyd's separates them in one iteration
    val data = embDf(Seq(
      0L -> Seq(0.1f, 0.0f), 1L -> Seq(10.0f, 10.2f),
      2L -> Seq(0.0f, 0.3f), 3L -> Seq(-0.1f, 0.1f),
      4L -> Seq(9.9f, 10.0f), 5L -> Seq(10.1f, 9.8f)))
    val m = KMeans.fit(data, k = 2, iters = 3)
    assert(m.counts.toSeq === Seq(3L, 3L))
    // exact integer means: floor(avg of quantized coords)
    // blob A lons: 100000, 0, -100000 -> sum 0 -> 0; lats: 0, 300000, 100000 -> floor(400000/3)=133333
    assert(m.centroids(0).toSeq === Seq(0L, 133333L))
    // blob B lons: 10000000, 9900000, 10100000 -> 10000000; lats: 10200000, 10000000, 9800000 -> 10000000
    assert(m.centroids(1).toSeq === Seq(10000000L, 10000000L))
  }

  test("empty cluster keeps its seed centroid with n = 0") {
    // all points sit at the origin except the k=2 seeds; seed 1 is alone
    // far away but every point (including both seeds) is nearer to one
    // centroid after round 1 collapses them
    val data = embDf(Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(100.0f, 100.0f),
      2L -> Seq(0.0f, 0.1f), 3L -> Seq(0.1f, 0.0f), 4L -> Seq(100.0f, 100.1f)))
    val m = KMeans.fit(data, k = 3, iters = 2)
    // seed 2 was (0, 0.1): after iter 1 the origin cloud assigns to
    // cluster 0 or 2 by distance; verify some cluster keeps nonzero
    // counts and that the model stays well-formed with k entries
    assert(m.centroids.length === 3)
    assert(m.counts.sum === 5L)
    assert(m.counts.forall(_ >= 0L))
  }

  test("tie in distance assigns to the lowest cluster id") {
    // point 2 is exactly equidistant from both seeds
    val data = embDf(Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(2.0f, 0.0f), 2L -> Seq(1.0f, 0.0f)))
    val m = KMeans.fit(data, k = 2, iters = 1)
    // tie -> cluster 0, so cluster 0 averages {0.0, 1.0} -> 500000
    assert(m.counts.toSeq === Seq(2L, 1L))
    assert(m.centroids(0).toSeq === Seq(500000L, 0L))
    assert(m.centroids(1).toSeq === Seq(2000000L, 0L))
  }

  test("matches a naive in-memory Lloyd's run exactly") {
    val rnd = new scala.util.Random(42)
    val n = 200; val dim = 8; val k = 5; val iters = 4
    val raw = (0L until n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val m = KMeans.fit(embDf(raw), k = k, iters = iters)

    // naive reference on the same quantization
    val q = raw.map { case (_, v) => v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray }
    var cents = (0 until k).map(q(_).clone()).toArray
    var counts = Array.fill(k)(0L)
    for (_ <- 1 to iters) {
      val asg = q.map { p =>
        (0 until k).minBy(c => (cents(c), p).zipped.map((a, b) => { val d = b - a; d * d }).sum)
      }
      val next = cents.map(_.clone()); val nc = Array.fill(k)(0L)
      for (c <- 0 until k) {
        val members = q.indices.filter(asg(_) == c)
        if (members.nonEmpty) {
          nc(c) = members.size.toLong
          for (d <- 0 until dim)
            next(c)(d) = math.floor(members.map(q(_)(d)).sum.toDouble / members.size).toLong
        }
      }
      cents = next; counts = nc
    }
    assert(m.counts.toSeq === counts.toSeq)
    assert(m.centroids.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq)
  }

  test("fit is deterministic across runs") {
    val rnd = new scala.util.Random(7)
    val raw = (0L until 100L).map(i => i -> Seq.fill(4)(rnd.nextFloat()))
    val a = KMeans.fit(embDf(raw), k = 3, iters = 3)
    val b = KMeans.fit(embDf(raw), k = 3, iters = 3)
    assert(a.centroids.map(_.toSeq).toSeq === b.centroids.map(_.toSeq).toSeq)
    assert(a.counts.toSeq === b.counts.toSeq)
  }

  test("centroidsDf long form: k*dim rows, 1-based pos, counts attached") {
    val data = embDf(Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(1.0f, 1.0f), 2L -> Seq(0.1f, 0.1f)))
    val df = KMeans.centroidsDf(data, k = 2, iters = 2)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 4)
    assert(rows.map(_._2).toSet === Set(1L, 2L))
    assert(rows.filter(_._1 == 0L).head._4 === 2L) // cluster 0 holds ids 0 and 2
  }

  test("assign labels every vector with the training metric") {
    val data = embDf(Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(10.0f, 10.0f),
      2L -> Seq(0.2f, 0.1f), 3L -> Seq(9.8f, 10.1f)))
    val m = KMeans.fit(data, k = 2, iters = 2)
    val asg = KMeans.assign(data, m).select("vec_id", "cluster_id").as[(Long, Long)]
      .collect().toMap
    assert(asg(0L) === asg(2L))
    assert(asg(1L) === asg(3L))
    assert(asg(0L) !== asg(1L))
  }

  test("outliers: the far point ranks first with its exact integer distance") {
    // two tight blobs plus one point far from both — it must be rank 1,
    // and dist_q must be the exact quantized squared L2 to ITS centroid
    val data = embDf(Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(10.0f, 10.0f),
      2L -> Seq(0.1f, 0.0f), 3L -> Seq(9.9f, 10.0f),
      4L -> Seq(5.0f, 20.0f))) // the outlier
    val out = KMeans.outliers(data, k = 2, iters = 2, topN = 3)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("cluster_id"), r.getAs[Long]("dist_q")))
    assert(out.length == 3)
    assert(out.head._1 == 1L && out.head._2 == 4L)
    // cross-check the distance against a direct assign+recompute
    val m = KMeans.fit(data, k = 2, iters = 2)
    val c = m.centroids(out.head._3.toInt)
    val q = Seq(5000000L, 20000000L)
    val expect = q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(out.head._4 == expect)
    // ranks are dense and ordered by distance desc
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out.sliding(2).forall(w => w.head._4 >= w.last._4))
  }

  test("pqDistortion: per-subspace sums equal a local quantize-and-assign replay") {
    val rnd = new scala.util.Random(11)
    val raw = (0L until 40L).map(i => i -> Seq.fill(8)(rnd.nextFloat()))
    val corpus = embDf(raw)
    val model = Ann.pqTrain(corpus, dim = 8, m = 2, ksub = 4, iters = 2)
    val got = Ann.pqDistortion(corpus, model)
      .select("subspace", "n_vectors", "sum_dist_q")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[java.math.BigDecimal](2).longValueExact()))).toMap
    val expect = (0 until model.m).map { s =>
      val sums = raw.map { case (_, v) =>
        val sub = v.slice(s * model.subWidth, (s + 1) * model.subWidth)
          .map(x => math.floor(x * 1e6 + 0.5).toLong)
        model.subModels(s).centroids.map(c =>
          c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
      s.toLong -> ((raw.length.toLong, sums))
    }.toMap
    assert(got == expect)
  }

  test("clusterPurity: separated blobs score 1.0; label ties pick the lowest label") {
    // seeds are ids 0 and 1, one in each blob, so Lloyd's separates them
    val blobA = Seq(0L -> Seq(0.1f, 0.0f), 2L -> Seq(0.0f, 0.2f), 3L -> Seq(-0.1f, 0.1f))
    val blobB = Seq(1L -> Seq(10.0f, 10.1f), 4L -> Seq(9.9f, 10.0f),
      5L -> Seq(10.1f, 9.9f), 6L -> Seq(10.0f, 10.0f))
    val emb = embDf(blobA ++ blobB)
      // blob A all label 0; blob B splits 2-2 between labels 3 and 1
      .withColumn("label",
        when(col("vec_id").isin(0L, 2L, 3L), 0L)
          .when(col("vec_id").isin(1L, 4L), 3L).otherwise(1L).cast("int"))
    val got = KMeans.clusterPurity(emb, k = 2, iters = 2)
      .select("cluster_id", "n", "majority_label", "n_majority", "purity")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 3L, 0L, 3L, 1.0)))
    assert(got(1L) == ((1L, 4L, 1L, 2L, 0.5))) // 2-2 tie: lowest label wins
  }

  test("pqRecall: blob-level truth survives ADC exactly; intra-blob rank loss doesn't count") {
    val rnd = new scala.util.Random(13)
    // 4 well-separated blobs of 5 vectors each; with k = 4 the exact-L2
    // truth set is exactly the 4 blob-mates, a set ADC preserves even
    // though it collapses the WITHIN-blob ordering (the designed loss)
    val raw = (0L until 20L).map { i =>
      val c = (i % 4).toInt
      i -> Seq.fill(8)(c * 2.0f + rnd.nextFloat() * 0.1f)
    }
    val corpus = embDf(raw)
    val got = Ann.pqRecall(corpus.filter(col("vec_id") < 4), corpus,
      dim = 8, m = 2, ksub = 4, iters = 2, k = 4)
      .select("probe_id", "hits", "recall").as[(Long, Long, Double)].collect()
    assert(got.length == 4)
    assert(got.forall(r => r._2 == 4L && r._3 == 1.0), got.mkString(","))
  }

  test("knnConfusion: separated blobs sit on the diagonal; split votes fall to the lowest label") {
    // A-blob ids 0,1 (label 0), B-blob ids 3,4 (label 1), center id 6
    // (label 1) whose 2 nearest split 1-1 across the blobs -> pred 0
    val emb = embDf(Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(0.0f, 2.0f),
      3L -> Seq(10.0f, 10.0f), 4L -> Seq(10.0f, 8.0f),
      6L -> Seq(5.0f, 5.0f)))
      .withColumn("label", (col("vec_id") >= 3L).cast("int"))
    val got = Ann.knnConfusion(emb, emb, k = 2)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((0L, 0L) -> 2L, (1L, 1L) -> 2L, (1L, 0L) -> 1L))
  }

  test("intrinsicDim: estimate equals a local replay and reads ~2 on a planted 2-manifold") {
    val rnd = new scala.util.Random(5)
    // points on a 2-plane linearly embedded in 8 ambient dims
    val raw = (0L until 60L).map { i =>
      val a = rnd.nextFloat() * 4 - 2; val b = rnd.nextFloat() * 4 - 2
      i -> Seq(a, b, a + b, a - b, 0.5f * a, 0.5f * b, 2 * a + b, a - 2 * b).map(_.toFloat)
    }
    val r = Ann.intrinsicDim(embDf(raw), embDf(raw)).collect().head
    def lnq(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    val q = raw.map { case (id, v) => id -> v.map(x => math.floor(x * 1e6 + 0.5).toLong) }.toMap
    val xs = raw.map(_._1).flatMap { pid =>
      val ds = raw.map(_._1).filter(_ != pid).map { nid =>
        q(pid).zip(q(nid)).map { case (x, y) => (x - y) * (x - y) }.sum -> nid
      }.sorted
      if (ds(0)._1 >= 1L) Some(pid -> (lnq(ds(1)._1) - lnq(ds(0)._1))) else None
    }
    val n = xs.length.toLong
    val pts = xs.sortBy { case (pid, x) => (x, pid) }.zipWithIndex
      .collect { case ((_, x), i0) if i0 + 1 < n => (x, lnq(n) - lnq(n - (i0 + 1))) }
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val dHat = 2.0 * sxy.toDouble / sxx.toDouble
    assert(r.getAs[Long]("n_probes") == n && r.getAs[Long]("n_points") == n - 1)
    assert(r.getAs[Double]("d_hat") == dHat)
    assert(dHat > 1.2 && dHat < 3.0, s"2-manifold should read ~2, got $dHat")
  }

  test("sq8Profile: codes and reconstruction errors equal a local replay; constant dim is exact") {
    val rnd = new scala.util.Random(7)
    // dim 0 constant (zero range -> code 0, error 0), dims 1-3 random
    val raw = (0L until 30L).map(i => i -> (0.5f +: Seq.fill(3)(rnd.nextFloat() * 2 - 1)))
    val got = Ann.sq8Profile(embDf(raw))
      .select("pos", "n_values", "min_q", "max_q", "sum_code", "sum_err_q")
      .as[(Long, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    for (p <- 0 until 4) {
      val xs = raw.map(t => math.floor(t._2(p) * 1e6 + 0.5).toLong)
      val (mn, mx) = (xs.min, xs.max)
      val codes = xs.map(x => if (mx > mn) (x - mn) * 255 / (mx - mn) else 0L)
      val errs = xs.zip(codes).map { case (x, c) => math.abs(x - (mn + c * (mx - mn) / 255)) }
      assert(got(p.toLong) == ((p.toLong, 30L, mn, mx, codes.sum, errs.sum)))
    }
    assert(got(0L)._5 == 0L && got(0L)._6 == 0L)
  }

  test("PQ: codes are in range, identical vectors encode identically") {
    val rnd = new scala.util.Random(3)
    val raw = (0L until 60L).map(i => i -> Seq.fill(8)(rnd.nextFloat()))
    val dup = raw :+ (60L -> raw(5)._2) // vector 60 duplicates vector 5
    val corpus = embDf(dup)
    val model = Ann.pqTrain(corpus, dim = 8, m = 2, ksub = 4, iters = 2)
    assert(model.m === 2 && model.subWidth === 4)
    val codes = Ann.pqEncode(corpus, model).select("vec_id", "codes")
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 4)))
    assert(codes(60L) === codes(5L))
  }

  test("PQ ADC search ranks an exact duplicate first on clustered data") {
    val rnd = new scala.util.Random(13)
    val centers = Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0f, 0f, 1f, 0f))
    val raw = (0L until 90L).map { i =>
      val c = centers((i % 3).toInt)
      i -> c.map(x => x + rnd.nextFloat() * 0.05f)
    }
    val corpus = embDf(raw :+ (90L -> raw(0)._2)) // 90 duplicates 0
    val probes = embDf(Seq(0L -> raw(0)._2))
    val model = Ann.pqTrain(corpus, dim = 4, m = 2, ksub = 4, iters = 3)
    val hits = Ann.pqTopK(probes, corpus, model, k = 91)
      .select("rank", "neighbor_id", "adc_dist").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    // the exact duplicate shares all PQ codes with the probe, so its ADC
    // distance is the probe's own quantization error — the minimum any
    // candidate can achieve (same-cell candidates tie with it, ranked by id)
    val dupDist = hits.find(_._2 == 90L).get._3
    assert(dupDist === hits.head._3)
    assert(hits.map(_._3).toSeq === hits.map(_._3).sorted.toSeq)
    // and all top-rank ties share the duplicate's code cell distance
    assert(hits.takeWhile(_._3 == dupDist).map(_._2).contains(90L))
  }

  test("IVF-PQ: exact duplicate lands in the probe's cell and achieves the minimal ADC") {
    val rnd = new scala.util.Random(17)
    val centers = Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0f, 0f, 1f, 0f))
    val raw = (0L until 90L).map { i =>
      val c = centers((i % 3).toInt)
      i -> c.map(x => x + rnd.nextFloat() * 0.05f)
    }
    val corpus = embDf(raw :+ (90L -> raw(0)._2))
    val probes = embDf(Seq(0L -> raw(0)._2))
    val model = Ann.ivfPqTrain(corpus, dim = 4, nlist = 3, coarseIters = 3,
      m = 2, ksub = 4, pqIters = 2)
    val hits = Ann.ivfPqTopK(probes, corpus, model, k = 91, nprobe = 1)
      .select("rank", "neighbor_id", "adc_dist").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    // the duplicate shares the probe's cell and all residual codes: its
    // ADC distance is the probe's own quantization error — the minimum
    val dup = hits.find(_._2 == 90L)
    assert(dup.isDefined, "duplicate must be searchable in the probe's own cell")
    assert(dup.get._3 === hits.head._3)
    assert(hits.map(_._3).toSeq === hits.map(_._3).sorted.toSeq)
    // nprobe=1 on cleanly clustered data: candidates only from one cell
    assert(hits.length <= 31, "one cell of a 3-cluster corpus holds about a third of it")
  }

  test("IVF-PQ training is deterministic") {
    val rnd = new scala.util.Random(23)
    val raw = (0L until 80L).map(i => i -> Seq.fill(8)(rnd.nextFloat()))
    val a = Ann.ivfPqTrain(embDf(raw), dim = 8, nlist = 4, coarseIters = 2, m = 2, ksub = 4, pqIters = 2)
    val b = Ann.ivfPqTrain(embDf(raw), dim = 8, nlist = 4, coarseIters = 2, m = 2, ksub = 4, pqIters = 2)
    assert(a.coarse.centroids.map(_.toSeq).toSeq === b.coarse.centroids.map(_.toSeq).toSeq)
    assert(a.pq.subModels.map(_.centroids.map(_.toSeq).toSeq).toSeq ===
      b.pq.subModels.map(_.centroids.map(_.toSeq).toSeq).toSeq)
  }

  test("trained IVF centroids slot into ivfTopK and preserve top-1 recall on clustered data") {
    val rnd = new scala.util.Random(11)
    // 4 well-separated clusters of 25 vectors each
    val centers = Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))
    val raw = (0L until 100L).map { i =>
      val c = centers((i % 4).toInt)
      i -> c.map(x => x + rnd.nextFloat() * 0.05f)
    }
    val corpus = embDf(raw)
    val probes = embDf(raw.take(8))
    val m = KMeans.fit(corpus, k = 4, iters = 3)
    val trained = Ann.ivfTopKTrained(probes, corpus, m, k = 3, nprobe = 1)
      .select("probe_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect()
    val exact = Ann.bruteForceTopK(probes, corpus, k = 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // with cleanly clustered data and nprobe=1, the trained cells contain
    // each probe's true nearest neighbor
    val top1 = trained.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    assert(exact.keys.forall(p => top1.get(p).contains(exact(p))))
  }

  test("clusterDrift: hand-derived occupancy drift over a shared cluster space") {
    import org.apache.spark.sql.functions.col
    def flq(n: Long): Long = math.floor(StrictMath.log(n.toDouble) * 1e6).toLong
    // seeds = ids 0 and 1, one per blob -> cluster 0 at ~0, cluster 1 at ~10;
    // even ids land in cluster 0, odd ids in cluster 1
    val emb = embDf(Seq(
      0L -> Seq(0.0f), 1L -> Seq(10.0f), 2L -> Seq(0.1f), 3L -> Seq(10.1f)))
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val out = KMeans.clusterDrift(emb, a, b, k = 2, iters = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // drift_0 = [flq(3)-flq(4)] - [flq(1)-flq(4)] = flq(3); drift_1 mirrors
    assert(out == Seq(
      (0L, 2L, 0L, flq(3) - flq(1)),
      (1L, 0L, 2L, flq(1) - flq(3))))
    // a corpus absent everywhere still yields the dense k-row table
    val empty = emb.filter(col("vec_id") < 0)
    val vsEmpty = KMeans.clusterDrift(emb, a, empty, k = 2, iters = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(vsEmpty.map(_._1) == Seq(0L, 1L) && vsEmpty.map(_._3).forall(_ == 0L))
    // n_b = 0 and N_b = 0 everywhere: the B side contributes flq(1)-flq(2)
    assert(vsEmpty.head == ((0L, 2L, 0L, (flq(3) - flq(4)) - (flq(1) - flq(2)))))
  }
}
