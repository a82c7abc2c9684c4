package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  import java.sql.Timestamp
  /** UTC timestamp helper: ts("2023-01-01 08:00:00"). */
  def ts(s: String): Timestamp = Timestamp.valueOf(s) // JVM TZ pinned to UTC in tests
}

object SparkSpec {
  lazy val session: SparkSession = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    GraftSession.local(cores = 4)
  }
}
