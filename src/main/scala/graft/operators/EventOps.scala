package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Generic event-stream operators (no geometry). */
object EventOps {

  /** Gap-based sessionization: a new session starts at the first event of
    * a user or after a silence > gapMinutes. Same conditional-cumulative
    * -sum idiom as tripleg segmentation (SURVEY.md §2.5). Adds a per-user
    * dense `session_id`.
    */
  def sessionize(events: DataFrame, gapMinutes: Double = 30.0,
                 tsCol: String = "ts_us", userCol: String = "user_id", idCol: String = "event_id"): DataFrame = {
    val gapUs = (gapMinutes * 60e6).toLong
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull || col(tsCol) - prev > gapUs, 1L).otherwise(0L)
    events.withColumn("session_id", sum(newSession).over(w) - 1L)
  }
}
