package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Event-time operators over the events stream table (batch forms; the
  * streaming forms live in graft.streaming.EventPipeline and share the
  * same column expressions).
  *
  * Outputs use epoch SECONDS (bigint) instead of raw timestamps: the
  * source carries nanosecond parquet timestamps that Spark truncates to
  * µs, and flooring to whole seconds makes Spark and any ns-capable oracle
  * agree exactly.
  */
object Events {

  /** Tumbling event-time window aggregate: (hour, event_type) counts and
    * exact-decimal value sums. Batch analog of the streaming
    * `window($"ts", "1 hour")` aggregation; map-side partial aggregation
    * applies, so only (window, type) pairs shuffle.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapSeconds`. Classic lag+cumsum over a per-user window —
    * one shuffle on user_id. For hot-key skew (one user = one giant task),
    * use [[sessionizeSalted]]. Output: one row per session with stable
    * integer/epoch-second fields.
    */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isNew = when(prevTs.isNull ||
      (unix_micros(col("ts")) - unix_micros(prevTs)) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    events
      .withColumn("session_idx", sum(isNew).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("event_id").as("first_event_id"),
        unix_timestamp(min("ts")).as("start_epoch"),
        unix_timestamp(max("ts")).as("end_epoch"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
  }

  /** Skew-safe sessionization, bit-identical to [[sessionize]].
    *
    * `Window.partitionBy("user_id")` puts a user's ENTIRE history in one
    * task — at 100 TB a hot user (bot, SDK default id, test account) is a
    * straggler or an OOM. This variant salts the window key with a coarse
    * time chunk so no task ever sees more than one chunk of one user:
    *
    *  1. local pass — window over (user_id, chunk), chunk =
    *     floor(event-time / chunkSeconds): per-chunk sessions via the same
    *     lag+cumsum, reduced to one summary row each (count, min/max time,
    *     exact-decimal value sum). Parallelism = users x chunks.
    *  2. merge pass — window over user_id again, but now over SESSION
    *     summary rows (orders of magnitude fewer than events; a chunk
    *     contributes at most chunkSeconds/gapSeconds + 1 summaries):
    *     sessions whose start follows the previous session's end within the
    *     gap are merged (a chunk boundary only ever SPLITS a true session,
    *     and the boundary events' gap condition is exactly the summaries'
    *     start-vs-end condition, so merging restores true sessions — both
    *     decimal sums and counts re-aggregate associatively).
    *
    * chunkSeconds must be >= gapSeconds (a summary row never spans a gap).
    */
  def sessionizeSalted(
      events: DataFrame,
      gapSeconds: Long,
      chunkSeconds: Long): DataFrame = {
    require(chunkSeconds >= gapSeconds,
      "chunkSeconds must be >= gapSeconds so chunk merges stay adjacent-only")
    val us = unix_micros(col("ts"))
    val chunked = events.withColumn("chunk",
      floor(us / lit(chunkSeconds * 1000000L)))
    val byUserChunk = Window.partitionBy("user_id", "chunk")
      .orderBy("ts", "event_id")
    val prevTs = lag(col("ts"), 1).over(byUserChunk)
    val isNewLocal = when(prevTs.isNull ||
      (us - unix_micros(prevTs)) > gapSeconds * 1000000L, 1L).otherwise(0L)
    val localSessions = chunked
      .withColumn("local_idx", sum(isNewLocal).over(
        byUserChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "chunk", "local_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("event_id").as("first_event_id"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        sum(col("value").cast(DecimalType(18, 6))).as("sum_dec"))
    val byUser = Window.partitionBy("user_id")
      .orderBy("start_us", "first_event_id")
    val prevEnd = lag(col("end_us"), 1).over(byUser)
    val isNewSession = when(prevEnd.isNull ||
      col("start_us") - prevEnd > gapSeconds * 1000000L, 1L).otherwise(0L)
    localSessions
      .withColumn("session_idx", sum(isNewSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        sum(col("n_events")).as("n_events"),
        min("first_event_id").as("first_event_id"),
        min("start_us").as("start_us"),
        max("end_us").as("end_us"),
        sum(col("sum_dec")).cast("double").as("sum_value"))
      // integer div, not `/` (double division rounds near boundaries)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("first_event_id"),
        expr("start_us div 1000000").as("start_epoch"),
        expr("end_us div 1000000").as("end_epoch"),
        col("sum_value"))
  }
}
