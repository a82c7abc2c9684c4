package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join semantics: bit-identical to the plain equi-join under any
  * salt factor, with the replication visible in the plan. */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def fixture = {
    // one hot key (90% of rows), one warm, one absent from the dim
    val left = (0L until 200L).map { i =>
      val k = if (i % 10 < 9) "hot" else if (i % 2 == 0) "warm" else "missing"
      (i, k, i * 3)
    }.toDF("doc_id", "k", "v")
    val dim = Seq(("hot", 1L), ("warm", 2L), ("cold", 3L)).toDF("k", "dv")
    (left, dim)
  }

  test("result identical to the plain join for several salt factors") {
    val (left, dim) = fixture
    val want = left.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    for (s <- Seq(1, 4, 32)) {
      val got = SkewJoin.saltedEquiJoin(left, dim, Seq("k"), s)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"salt=$s diverged")
    }
  }

  test("multi-key join and partitioning invariance") {
    val left = (0L until 100L).map(i => (i, "en", i % 3, s"t$i")).toDF("doc_id", "lang", "b", "t")
    val dim = Seq(("en", 0L, "x"), ("en", 1L, "y"), ("de", 2L, "z")).toDF("lang", "b", "label")
    val want = left.join(dim, Seq("lang", "b")).collect()
      .map(r => r.toSeq.toList).toSet
    val got = SkewJoin.saltedEquiJoin(left.repartition(13), dim, Seq("lang", "b"), 8)
      .collect().map(r => r.toSeq.toList).toSet
    assert(got == want)
  }

  test("plan replicates the small side via a scan-stage explode") {
    val (left, dim) = fixture
    val plan = SkewJoin.saltedEquiJoin(left, dim, Seq("k"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), s"no explode in plan:\n$plan")
  }
}
