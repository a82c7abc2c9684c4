package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical storage layout for the engine at scale (SURVEY.md §4):
  * parquet bucketed by `user_id`. Every preprocessing operator shuffles
  * on `user_id`; reading a user-bucketed table lets Catalyst skip that
  * shuffle entirely (bucket join / bucket-preserving aggregation), which
  * at 100 TB is the difference between one wide shuffle per stage and
  * none.
  */
object Storage {

  /** Write a domain table bucketed by user_id (saveAsTable — bucketing
    * metadata needs the catalog).
    */
  def writeUserBucketed(df: DataFrame, tableName: String, buckets: Int = 256,
                        sortCols: Seq[String] = Seq("user_id")): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, "user_id")
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(tableName)

  def readTable(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)
}
