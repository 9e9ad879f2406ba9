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
    * one shuffle on user_id. (At extreme per-user skew, pre-split by
    * (user_id, day) and merge boundary sessions; not needed at these SFs.)
    * Output: one row per session with stable integer/epoch-second fields.
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
}
