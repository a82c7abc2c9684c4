package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, UnsafeProjection}
import org.apache.spark.sql.graftshim.DataFrameShim
import org.apache.spark.sql.types.{LongType, StructField}

/** Dense sequential id assignment (0..n-1) in a given total order.
  *
  * The reference assigns entity ids positionally after a (user, time) sort
  * (preprocessing/positionfixes.py:163-164). A Spark `row_number()` over a
  * global window would force everything through one partition, so instead
  * we do a distributed range-sort and then `zipWithIndex`, which computes
  * per-partition offsets with one lightweight extra job and keeps the data
  * fully distributed — the scalable equivalent of a global dense rank.
  * `zipWithIndex`'s two internal jobs both read the range-sort's
  * materialized shuffle files, so the upstream lineage runs once (a
  * per-group rank + cumulated-offset formulation reads it twice; measured
  * ~30% slower across the pipeline).
  *
  * The id is appended on `InternalRow`s (shim-bridged): no decode to
  * external Rows and re-encode, which halves the serialization work of
  * every id-assigning stage.
  */
object Ids {

  def withSequentialId(df: DataFrame, idCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val newSchema = sorted.schema.copy(fields =
      sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))

    val rdd = sorted.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      // project to fresh UnsafeRows: upstream iterators reuse row buffers
      val proj = UnsafeProjection.create(newSchema)
      val joined = new JoinedRow
      val idRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      it.map { case (row, i) =>
        idRow.update(0, i)
        proj(joined(row, idRow)): InternalRow
      }
    }
    DataFrameShim.fromInternalRows(spark, rdd, newSchema)
  }
}
