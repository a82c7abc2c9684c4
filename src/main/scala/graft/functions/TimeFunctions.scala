package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/interval column helpers shared across operators. */
object TimeFunctions {

  /** Interval duration in (fractional) seconds. */
  def durationSeconds(startedAt: Column, finishedAt: Column): Column =
    (unix_micros(finishedAt) - unix_micros(startedAt)) / lit(1000000.0)

  /** Portion of [s1,e1] overlapped by [s2,e2] — the reference's
    * calc_temp_overlap (preprocessing/util.py:12-44); 0 for empty spans.
    */
  def overlapRatio(s1: Column, e1: Column, s2: Column, e2: Column): Column = {
    val overlap = greatest(
      lit(0L),
      least(unix_micros(e1), unix_micros(e2)) - greatest(unix_micros(s1), unix_micros(s2)))
    val dur = unix_micros(e1) - unix_micros(s1)
    when(dur <= 0L, lit(0.0)).otherwise(overlap.cast("double") / dur.cast("double"))
  }

  /** OSNA time-frame label from a timestamp: weekend / rest / work /
    * leisure (analysis/location_identification.py:347-355). Monday=0
    * weekday convention like Python's datetime.weekday().
    */
  def osnaLabel(ts: Column): Column = {
    val pyWeekday = (dayofweek(ts) + lit(5)) % 7 // Sun=1..Sat=7 → Mon=0..Sun=6
    val h = hour(ts)
    when(pyWeekday >= 5, "weekend")
      .when(h >= 2 && h < 8, "rest")
      .when(h >= 8 && h < 19, "work")
      .otherwise("leisure")
  }
}
