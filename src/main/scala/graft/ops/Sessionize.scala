package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch sessionization (gaps-and-islands): a new session starts when the
  * gap to the previous event of the same key exceeds `gapMicros`. One
  * shuffle on the session key; both window passes share the same
  * partitioning so Catalyst plans a single exchange.
  *
  * The streaming twin of this operator is
  * [[graft.streaming.EventSessions]] (session_window / state store); this
  * batch form is the backfill path.
  */
object Sessionize {

  /** Adds `ts_us` (event-time micros) and `session_id` (1-based per key). */
  def sessions(df: DataFrame, key: Column, ts: Column, tiebreak: Column,
      gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("ts_us"), tiebreak)
    df.withColumn("ts_us", unix_micros(ts))
      .withColumn("_prev_us", lag("ts_us", 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_us").isNull || col("ts_us") - col("_prev_us") > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_id", sum("_new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_us", "_new_session")
  }
}
