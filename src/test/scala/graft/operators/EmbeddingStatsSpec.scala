package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingStatsSpec extends SparkSpec {

  test("spectralAxis: exact two-step integer power iteration on a diagonal fixture") {
    import spark.implicits._
    // q rows: (5e5, 0) x2, (0, 5e5) => M = diag(5e11, 2.5e11)
    val embs = Seq((0L, Seq(0.5f, 0.0f)), (1L, Seq(0.5f, 0.0f)), (2L, Seq(0.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val rows = EmbeddingStats.spectralAxis(embs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val m0 = BigInt(500000L) * 500000L * 2 // 5e11
    val m1 = BigInt(500000L) * 500000L     // 2.5e11
    assert(rows(0L)._1 == m0.toString && rows(1L)._1 == m1.toString)
    assert(rows(0L)._2 == (m0 * m0).toString && rows(1L)._2 == (m1 * m1).toString)
    assert(rows(0L)._3 == 1.0 && rows(1L)._3 == (m1 * m1).toDouble / (m0 * m0).toDouble)
    val lambda = (m0 * m0 + m1 * m1).toDouble / (m0 + m1).toDouble
    assert(rows(0L)._4 == lambda && rows(0L)._5 == lambda / (m0 + m1).toDouble)
  }
  import spark.implicits._

  test("moments match a local single-threaded recomputation across partitions") {
    val vecs = (0 until 40).map(i =>
      Array(0.1f * (i % 7), -0.05f * i, 0.3f - 0.01f * i))
    val df = spark.createDataset(vecs.map(_.toSeq)).toDF("embedding").repartition(5)
    val got = EmbeddingStats.covarianceGate(df)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap

    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    val want = (for { i <- 0 until 3; j <- i until 3 } yield
      (i.toLong, j.toLong) -> q.map(v => v(i) * v(j)).sum).toMap
    assert(got == want)
  }

  test("labelSeparation: pairwise floor-mean centroid distances over three labels") {
    val df = Seq(
      (0L, Seq(0.0f, 0.0f), 0), (1L, Seq(0.0f, 2.0f), 0), // label 0 centroid (0, 1e6)
      (2L, Seq(3.0f, 1.0f), 1),                           // label 1 centroid (3e6, 1e6)
      (3L, Seq(0.0f, 1.0f), 2), (4L, Seq(0.0f, 2.0f), 2)  // label 2 centroid (0, 1.5e6)
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingStats.labelSeparation(df)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val M = 1000000L
    assert(got((0L, 1L)) == ((9L * M * M, 2L, 1L)))
    assert(got((0L, 2L)) == ((M / 2 * (M / 2), 2L, 2L)))
    assert(got((1L, 2L)) == ((9L * M * M + M / 2 * (M / 2), 1L, 2L)))
    assert(got.size == 3)
  }

  test("first-moment and count rows are present and exact") {
    val vecs = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 6.0f))
    val df = spark.createDataset(vecs).toDF("embedding")
    val rows = EmbeddingStats.moments(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).longValueExact()).toMap
    assert(rows((-1, -1)) == 3L)
    assert(rows((0, -1)) == 9000000L) // (1+3+5)*1e6
    assert(rows((1, -1)) == 12000000L)
  }

  test("partials combine through a bounded exchange (one row set per partition)") {
    val vecs = (0 until 100).map(i => Seq(i.toFloat, (100 - i).toFloat))
    val df = spark.createDataset(vecs).toDF("embedding").repartition(8)
    val plan = EmbeddingStats.moments(df).queryExecution.executedPlan.toString
    // partial + final aggregate around the single exchange
    assert("(?s)HashAggregate.*Exchange.*HashAggregate".r.findFirstIn(plan).isDefined, plan)
  }

  test("ragged dims across partitions fail loudly instead of merging") {
    val mixed = spark.createDataset(
      (0 until 20).map(_ => Seq(1.0f, 2.0f, 3.0f)) ++
        (0 until 20).map(_ => Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("embedding")
      .repartition(4)
    val e = intercept[Exception] {
      EmbeddingStats.pcaTopComponent(mixed)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("ragged"), s"expected a ragged-dims error, got: $msgs")
  }

  test("power iteration recovers a planted dominant direction") {
    // points spread along (3, 4)/5 with small orthogonal noise
    val dir = Array(0.6, 0.8)
    val vecs = (0 until 200).map { i =>
      val t = (i - 100) * 0.01
      val noise = ((i * 37) % 11 - 5) * 0.001
      Seq((t * dir(0) - noise * dir(1)).toFloat, (t * dir(1) + noise * dir(0)).toFloat)
    }
    val df = spark.createDataset(vecs).toDF("embedding")
    val (v, lambda) = EmbeddingStats.pcaTopComponent(df)
    val dot = math.abs(v(0) * dir(0) + v(1) * dir(1))
    assert(dot > 0.999, s"recovered ${v.toSeq}, |cos|=$dot")
    assert(lambda > 0)
    // Rayleigh stationarity: C v ~ lambda v (fixed-point of the iteration)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
  }
}
