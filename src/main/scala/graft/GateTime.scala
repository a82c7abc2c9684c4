package graft

/** Dev tool: time named gate queries, twice each — the first run pays
  * any shared-memo materialization, the second is the marginal cost
  * (what the gate adds to a full Bench run, where memos are warm).
  * `SPARK_GRAFT_SF_DIR=... runMain graft.GateTime q1_agg dedup_exact`
  */
object GateTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val q = SparkEntry.queries.getOrElse(n, sys.error(s"unknown gate '$n'"))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val rows = q(spark, dir).queryExecution.toRdd.count()
        println(f"[gatetime] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      }
    }
    spark.stop()
  }
}
