package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (engine extension: the
  * incremental/streaming-shaped capability the reference approximates with
  * request-time re-fetch, SURVEY §2.9).
  *
  * Batch formulation: a session starts whenever the gap to the previous event
  * of the same user exceeds the timeout; session id = running count of starts.
  * Two window passes over one shuffle by user — no state explosion at scale.
  * The streaming formulation lives in graft.streaming (mapGroupsWithState).
  */
object Sessionize {

  /** Assign `session_id` (per user, 0-based) to each event. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol).asc)
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val isStart = when(prevTs.isNull ||
      col(tsCol).cast("timestamp").cast("double") -
        prevTs.cast("timestamp").cast("double") > gapMinutes * 60L, 1L)
      .otherwise(0L)
    events
      .withColumn("__start", isStart)
      .withColumn("session_id",
        sum(col("__start")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__start")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapMinutes: Int): DataFrame = {
    assign(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
