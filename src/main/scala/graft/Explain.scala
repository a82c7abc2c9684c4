package graft
import org.apache.spark.sql.functions._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = "/root/testdata/sf0.001"
    println("=== q1_agg ===")
    SparkEntry.queries("q1_agg")(spark, dir).explain("formatted")
    println("=== dedup_exact ===")
    SparkEntry.queries("dedup_exact")(spark, dir).explain("formatted")
    println("=== q3_join ===")
    SparkEntry.queries("q3_join")(spark, dir).explain()
  }
}
