package graft
object Explain {
  /** Dev tool: print formatted physical plans for the named gate
    * queries (args), or a small default set. `runMain graft.Explain
    * ann_ivfpq curate_corpus` etc.
    */
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg", "dedup_exact", "q3_join")
    names.foreach { n =>
      println(s"=== $n ===")
      SparkEntry.queries.get(n) match {
        case Some(q) => q(spark, dir).explain("formatted")
        case None    => println(s"unknown query '$n' — keys: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
