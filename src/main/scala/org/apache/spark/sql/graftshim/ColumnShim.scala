package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a Catalyst [[Expression]] to a user-facing [[Column]].
  *
  * Spark 4 made the Column↔Expression conversion `private[sql]`
  * (columnNodeSupport.scala); libraries shipping native expressions
  * (this package's `graft.plans`) need exactly that one hop, so this shim
  * lives under `org.apache.spark.sql` — the same approach other
  * expression-bearing Spark libraries use. No other internals are
  * touched.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Internal-row DataFrame construction (`internalCreateDataFrame` is
  * `private[sql]`): lets id assignment append a column to UnsafeRows
  * without decoding to external [[org.apache.spark.sql.Row]]s and back.
  */
object DataFrameShim {
  def fromInternalRows(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
