package graft

import org.apache.spark.sql.types._

/** Canary for driver-regenerated testdata: asserts the column types the
  * adapters depend on, failing with a found-vs-expected schema diff so a
  * layout drift (round 7: events.ts silently became timestamp[us] and took
  * out 47 gate queries) is a 1-second diagnosis instead of a round-long
  * silent regression. Skips cleanly when /root/testdata is absent (CI
  * outside the driver sandbox).
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def present: Boolean = new java.io.File(sfDir).isDirectory

  private def schemaOf(table: String): StructType =
    spark.read.parquet(s"$sfDir/$table.parquet").schema

  private def assertCols(table: String, expected: Map[String, DataType => Boolean], describe: String): Unit = {
    val s = schemaOf(table)
    val problems = expected.flatMap { case (name, ok) =>
      s.fields.find(_.name == name) match {
        case None    => Some(s"$table.$name: MISSING (have: ${s.fieldNames.mkString(", ")})")
        case Some(f) => if (ok(f.dataType)) None else Some(s"$table.$name: found ${f.dataType.simpleString}, expected $describe-compatible")
      }
    }
    assert(problems.isEmpty,
      s"\nTestdata layout drift in $sfDir — adapters expect:\n  ${problems.mkString("\n  ")}\n" +
        s"Full $table schema: ${s.treeString}")
  }

  test("events.ts is a type EventsAdapter dispatches on (timestamp/ntz/long)") {
    assume(present, s"$sfDir not present")
    assertCols("events", Map(
      "ts" -> {
        case TimestampType | TimestampNTZType | LongType => true
        case _                                           => false
      },
      "event_id"   -> (_ == LongType),
      "user_id"    -> (_ == LongType),
      "event_type" -> (_ == StringType),
      "value"      -> (_ == DoubleType)
    ), "timestamp[(n)tz]/long")
    // and the adapter actually accepts the live layout end-to-end
    val df = graft.sources.EventsAdapter.events(spark, sfDir)
    assert(df.schema("t_us").dataType == LongType)
    assert(df.limit(1).count() == 1L)
  }

  test("documents / embeddings carry the columns the corpus operators read") {
    assume(present, s"$sfDir not present")
    assertCols("documents", Map(
      "doc_id" -> (_ == LongType),
      "text"   -> (_ == StringType),
      "lang"   -> (_ == StringType),
      "source" -> (_ == StringType)
    ), "long/string")
    assertCols("embeddings", Map(
      "vec_id" -> (_ == LongType),
      "embedding" -> {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _                                                  => false
      },
      "label" -> {
        case IntegerType | LongType => true
        case _                      => false
      }
    ), "array<float>/int")
  }

  test("lineitem / orders keep the TPC-H column types the q* gates read") {
    assume(present, s"$sfDir not present")
    assertCols("lineitem", Map(
      "l_orderkey"   -> (_ == LongType),
      "l_quantity"   -> (_ == DoubleType),
      "l_returnflag" -> (_ == StringType),
      "l_shipdate" -> {
        case TimestampType | TimestampNTZType | DateType => true
        case _                                           => false
      }
    ), "long/double/string/date-ish")
    assertCols("orders", Map(
      "o_orderkey" -> (_ == LongType),
      "o_custkey"  -> (_ == LongType)
    ), "long")
  }
}
