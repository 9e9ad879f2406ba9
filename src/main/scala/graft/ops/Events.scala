package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Daily conversion rate with WILSON score-interval bounds (Wilson
    * 1927; Brown, Cai & DasGupta 2001 recommend it over the Wald
    * interval, whose coverage collapses at small n and extreme p̂ — a
    * dashboard printing `p ± 1.96·√(p(1−p)/n)` lies exactly where it
    * matters): per day, n = distinct users with a `denomType` event,
    * x = those of them with a `numerType` event the same day, and the
    * 95% bounds
    * `(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)`.
    *
    * Oracle exactness (the e23 Welch discipline): counts are exact
    * longs; the interval is ONE FIXED expression tree of
    * correctly-rounded IEEE double ops (literals written `1.96E0` /
    * `3.8416E0` so BOTH engines parse doubles, never decimals; every
    * division by n casts to double explicitly; sqrt is correctly
    * rounded in both) mirrored token-for-token in the DuckDB oracle —
    * so the bounds hash-match bit-for-bit.
    *
    * Shape: two distinct (day, user) rollups (map-side combine), one
    * equi-join on (day, user), one day-keyed count rollup, then a pure
    * scan-stage float tree — fixed-width rows end to end.
    */
  def wilsonConversion(
      events: DataFrame, denomType: String, numerType: String)
      : DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"))
    val denom = e.filter(col("event_type") === denomType)
      .select("day", "user_id").distinct()
    val numer = e.filter(col("event_type") === numerType)
      .select("day", "user_id").distinct()
    val n = denom.groupBy("day").agg(count(lit(1)).as("n_users"))
    val x = denom.join(numer, Seq("day", "user_id"))
      .groupBy("day").agg(count(lit(1)).as("n_conv"))
    n.join(x, Seq("day"), "left")
      .withColumn("n_conv", coalesce(col("n_conv"), lit(0L)))
      .withColumn("p_hat",
        expr("CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)"))
      .withColumn("wilson_lo", expr(
        """((p_hat + 3.8416E0 / (2.0E0 * CAST(n_users AS DOUBLE)))
          | - 1.96E0 * sqrt((p_hat * (1.0E0 - p_hat)
          |     + 3.8416E0 / (4.0E0 * CAST(n_users AS DOUBLE)))
          |   / CAST(n_users AS DOUBLE)))
          | / (1.0E0 + 3.8416E0 / CAST(n_users AS DOUBLE))"""
          .stripMargin.replace("\n", " ")))
      .withColumn("wilson_hi", expr(
        """((p_hat + 3.8416E0 / (2.0E0 * CAST(n_users AS DOUBLE)))
          | + 1.96E0 * sqrt((p_hat * (1.0E0 - p_hat)
          |     + 3.8416E0 / (4.0E0 * CAST(n_users AS DOUBLE)))
          |   / CAST(n_users AS DOUBLE)))
          | / (1.0E0 + 3.8416E0 / CAST(n_users AS DOUBLE))"""
          .stripMargin.replace("\n", " ")))
      .select("day", "n_users", "n_conv", "p_hat", "wilson_lo",
        "wilson_hi")
  }

  /** Kaplan–Meier time-to-event curve (Kaplan & Meier 1958) over
    * funnel conversion — the censoring-honest answer to "how long
    * until a viewer purchases": a user's clock starts at their first
    * `startType` day, the event is their first `deathType` day at or
    * after it, and the study ends at an ADMINISTRATIVE cutoff
    * (`studyDays` after the corpus's first day) — users who have not
    * converted by the cutoff are right-censored at their observation
    * time, NOT counted as never-converting (dropping them is the
    * classic conversion-rate over-estimate this estimator fixes; e24
    * reads lag percentiles among CONVERTERS only, KM reads the whole
    * population). At each death time t: n_risk = users observed ≥ t,
    * d = conversions at exactly t, `S(t) = Π_{u ≤ t} (1 − d_u/n_u)`.
    *
    * Exactness: counts are exact longs; the survival product is a
    * deterministic LEFT-TO-RIGHT fold of `1 − d/n` factors in IEEE
    * doubles. The distinct event times are bounded by the CALENDAR
    * span (days — the corpus horizon, not the corpus), so the fold
    * runs on the driver over the collected time table (the
    * bounded-pull convention), and the DuckDB oracle replays the
    * identical fold as a recursive CTE in day order —
    * multiply-for-multiply the same doubles, hash-exact.
    *
    * Shape: two (user) rollups + one equi-join + one 1-row cutoff
    * broadcast + one time-keyed rollup (rows ≤ calendar days); only
    * that table reaches the driver.
    */
  def kaplanMeier(
      events: DataFrame, startType: String, deathType: String,
      studyDays: Long): DataFrame = {
    require(studyDays >= 0, s"studyDays must be >= 0: $studyDays")
    val spark = events.sparkSession
    val e = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"))
    val starts = e.filter(col("event_type") === startType)
      .groupBy("user_id").agg(min("day").as("fd"))
    val deaths = e.filter(col("event_type") === deathType)
      .join(starts, "user_id")
      .filter(col("day") >= col("fd"))
      .groupBy("user_id").agg(min("day").as("pd"))
    val cutoff = broadcast(e.agg((min("day") + studyDays).as("cut")))
    val lives = starts.join(deaths, Seq("user_id"), "left")
      .crossJoin(cutoff)
      .filter(col("fd") <= col("cut")) // entered the study at all
      .select(
        when(col("pd").isNotNull && col("pd") <= col("cut"),
          col("pd") - col("fd"))
          .otherwise(col("cut") - col("fd")).as("lt"),
        (col("pd").isNull || col("pd") > col("cut")).as("cens"))
    val byLt = lives.groupBy("lt")
      .agg(count(lit(1)).as("n_all"),
        sum(when(!col("cens"), 1L).otherwise(0L)).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val total = byLt.map(_._2).sum
    // n_risk at t = users with lifetime >= t; walk ascending, fold S
    var atRisk = total
    var surv = 1.0
    val rows = byLt.map { case (t, nAll, d) =>
      val n = atRisk
      if (d > 0) surv = surv * (1.0 - d.toDouble / n.toDouble)
      atRisk -= nAll
      (t, n, d, nAll - d, surv)
    }.filter(_._3 > 0) // the KM step function moves at death times only
    import spark.implicits._
    rows.toSeq
      .toDF("t_days", "n_risk", "n_churn", "n_exit_censored", "survival")
  }

  /** Seasonal-naive forecast BACKTEST over the hourly volume series —
    * the monitoring baseline every real forecaster must beat
    * (Hyndman & Athanasopoulos FPP §5.2: forecast hour h by the value
    * at h − season): per event type, MAE / bias / MAPE of predicting
    * each hour's count from its same-hour-yesterday count. An anomaly
    * monitor (e11/e25/e28/e29) asks "is NOW weird"; the backtest asks
    * "how predictable is this series at all" — the number that sizes
    * alert thresholds and forecast-model ambitions.
    *
    * Exactness: counts and absolute/signed error sums are exact longs;
    * MAE = one IEEE division; MAPE terms are each one IEEE division
    * cast to DECIMAL(18,6) and SUMMED AS DECIMAL (the s15 discount
    * convention — a float sum would expose engine accumulation order),
    * finished by one division. Hours missing a season-ago predecessor
    * (or with zero actuals, for MAPE) are excluded by construction.
    *
    * Shape: one (type, hour) hash-agg (map-side combine), ONE
    * self-equi-join on (type, hour − season), one type-keyed rollup.
    */
  def naiveForecastBacktest(
      events: DataFrame, seasonSeconds: Long = 86400L): DataFrame = {
    require(seasonSeconds > 0, s"season must be positive: $seasonSeconds")
    val hourly = events.groupBy(
        col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("cnt"))
    val joined = hourly.as("now").join(hourly.as("past"),
        col("now.event_type") === col("past.event_type") &&
        col("now.h") === col("past.h") + seasonSeconds)
      .select(col("now.event_type").as("event_type"),
        col("now.cnt").as("actual"), col("past.cnt").as("pred"))
      .withColumn("err", col("actual") - col("pred"))
    joined.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("err"))).as("abs_err_sum"),
        sum(col("err")).as("bias_sum"),
        sum(when(col("actual") > 0,
          expr("CAST(CAST(abs(err) AS DOUBLE) / CAST(actual AS DOUBLE)" +
            " AS DECIMAL(18,6))"))).as("ape_sum"),
        sum(when(col("actual") > 0, 1L).otherwise(0L)).as("n_mape"))
      .select(col("event_type"), col("n_hours"), col("abs_err_sum"),
        col("bias_sum"),
        expr("CAST(abs_err_sum AS DOUBLE) / CAST(n_hours AS DOUBLE)")
          .as("mae"),
        expr("CASE WHEN n_mape > 0 THEN CAST(ape_sum AS DOUBLE) / " +
          "CAST(n_mape AS DOUBLE) END").as("mape"))
  }

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

  /** Per-type z-scores of the hourly event-count series — the volume
    * anomaly monitor ("which hours are statistical outliers for this
    * event type") every ingest pipeline alerts on. Two aggregations:
    * the (type, hour) count (map-side partial over raw events, the only
    * big reduction) and tiny per-type moment rollups of THOSE counts,
    * joined back broadcast.
    *
    * Exactness: moments stay exact integers (count, sum, sum of squares)
    * and the z-score is ONE fixed double expression
    * `(n*c - s) / (c * sqrt((q*c - s²) / (c*(c-1))))` — algebraically
    * var_samp, but free of the engine-specific accumulation order a
    * built-in variance would introduce (sqrt and division are IEEE
    * correctly-rounded, so both engines agree bit-for-bit). Integer
    * moments hold while hours·max(n)² < 2^63.
    */
  def hourlyAnomaly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("c"), sum("n").as("s"),
        sum(col("n") * col("n")).as("q"))
    // degenerate series guard (r6, advisor find): a type with a single
    // hour bucket (c=1) or a constant count series (zero variance) has no
    // defined z-score — emit NULL instead of NaN/Inf, whose rendering
    // Spark and DuckDB disagree on
    val varNum = col("q") * col("c") - col("s") * col("s")
    hourly.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("hour_epoch"), col("n"),
        when(col("c") > 1 && varNum > 0,
          (col("n") * col("c") - col("s")).cast("double") /
            (col("c") * sqrt(varNum.cast("double") /
              (col("c") * (col("c") - 1)))))
          .otherwise(lit(null).cast("double")).as("z"))
  }

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

  /** As-of join: for each `left` row, the single most recent `right` row
    * with `right.timeCol <= left.timeCol` under the same `keyCol` (the
    * "latest event at-or-before the order" lookup every feature pipeline
    * needs). Left rows with no prior right row keep NULL payload
    * (left-outer as-of semantics; filter for inner).
    *
    * Plan shape — union + ordered window, NOT a range join: both inputs
    * union into one relation tagged by side, then ONE shuffle+sort on
    * (key, time) and a running `last(payload, ignoreNulls)` fills each
    * left row with the latest preceding right payload. Cost is
    * sort-merge-like O((|L|+|R|) log) per key with fixed-width rows; the
    * naive `JOIN ON key AND r.t <= l.t` + max is |L|x|R| per key and a
    * range join Spark would plan as BroadcastNestedLoop. Skew caveat: one
    * key's history lands in one task (same as [[sessionize]]; salt by
    * time-chunk with a carry-over merge pass if a key is hot).
    *
    * `timeCol` must be a totally-ordering integer (epoch µs here — the ns
    * parquet source truncates identically in Spark and DuckDB at µs).
    * Determinism requires `right` unique per (key, time) — the standard
    * ASOF precondition; ties at equal time match the right row (at-or-
    * before is inclusive: right sorts before left via the side tag).
    * Payload columns surface as `asof_<name>`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val r = right.select(
      col(keyCol) +: col(timeCol) +:
        rightPayload.map(c => col(c).as(s"asof_$c")): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** Skew-safe as-of join, result-identical to [[asofJoin]] (for
    * non-negative integer `timeCol`, e.g. epoch µs).
    *
    * [[asofJoin]]'s single window puts one key's ENTIRE history in one
    * task — the same hot-key straggler sessionize had before
    * [[sessionizeSalted]]. Same cure, adapted to as-of semantics:
    *
    *  1. local pass — the union+running-`last` fill windowed over
    *     (key, chunk), chunk = timeCol div chunkUs: a left row whose chunk
    *     contains an earlier right row is filled here. Parallelism =
    *     keys × chunks; no task sees more than one chunk of one key.
    *  2. carry pass — per (key, chunk) the chunk's LAST non-null payload
    *     (one summary row, taken from the same phase-1 window at the
    *     chunk's final right row), then a running `last` over summary and
    *     probe rows per key: a summary for chunk c sorts at c+1 so a probe
    *     (left chunk) at c sees exactly the chunks BEFORE it — strictly
    *     earlier chunks, never its own (phase 1 already decided those).
    *     Rows per key here = distinct chunks, bounded by time-range /
    *     chunkUs, independent of event counts.
    *
    * Per-column `coalesce(local, carry)` is exact: the latest non-null
    * at-or-before payload lives in the left row's own chunk iff phase 1
    * found it, else in the latest earlier chunk with one — which is what
    * the carry chain holds (null chunk summaries are skipped by
    * ignoreNulls, preserving [[asofJoin]]'s null-payload-invisible rule).
    */
  def asofJoinSalted(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightPayload: Seq[String],
      chunkUs: Long): DataFrame = {
    require(chunkUs > 0, "chunkUs must be positive")
    val r0 = right.select(
      col(keyCol) +: col(timeCol) +:
        rightPayload.map(c => col(c).as(s"asof_$c")): _*)
      .withColumn("__side", lit(0))
    val l0 = left.withColumn("__side", lit(1))
    val u = l0.unionByName(r0, allowMissingColumns = true)
      .withColumn("__chunk", expr(s"$timeCol div ${chunkUs}L"))
    val wLocal = Window.partitionBy(keyCol, "__chunk")
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localFilled = rightPayload.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"asof_$c"), ignoreNulls = true).over(wLocal))
    }
    // chunk summaries: the phase-1 running value AT the chunk's last right
    // row is the chunk's last non-null payload (left rows contribute only
    // ignored nulls)
    val summaries = localFilled.filter(col("__side") === 0)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCol, "__chunk").orderBy(col(timeCol).desc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol) +: col("__chunk") +:
        rightPayload.map(c => col(s"asof_$c")): _*)
    val probes = l0
      .select(col(keyCol), expr(s"$timeCol div ${chunkUs}L").as("__chunk"))
      .distinct()
      .withColumn("__sk", col("__chunk")).withColumn("__cside", lit(1))
    val shifted = summaries
      .withColumn("__sk", col("__chunk") + 1).withColumn("__cside", lit(0))
      .drop("__chunk")
    val wCarry = Window.partitionBy(keyCol)
      .orderBy(col("__sk"), col("__cside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = rightPayload.foldLeft(
        probes.unionByName(shifted, allowMissingColumns = true)) { (df, c) =>
        df.withColumn(s"__carry_$c",
          last(col(s"asof_$c"), ignoreNulls = true).over(wCarry))
      }
      .filter(col("__cside") === 1)
      .select(col(keyCol) +: col("__chunk") +:
        rightPayload.map(c => col(s"__carry_$c")): _*)
    val joined = localFilled.filter(col("__side") === 1)
      .join(carry, Seq(keyCol, "__chunk"), "left")
    rightPayload.foldLeft(joined) { (df, c) =>
        df.withColumn(s"asof_$c",
          coalesce(col(s"asof_$c"), col(s"__carry_$c")))
      }
      .drop(rightPayload.map(c => s"__carry_$c"): _*)
      .drop("__side", "__chunk")
  }

  /** Per-left-row count of `right` rows with time in
    * `(left.time - windowUs, left.time]` under the same key — the funnel
    * question ("views in the hour before each purchase") and the general
    * sliding-lookback feature.
    *
    * Plan shape — bounded bucketized range join: both sides bucket time by
    * the window width, the left side probes its own bucket and the
    * previous one (a half-open window of width W spans at most two
    * W-buckets), and the join is pure EQUI on (key, bucket) with the range
    * test as a cheap post-filter. Work is 2x|L| join rows against
    * hash-partitioned buckets — never the BroadcastNestedLoopJoin a raw
    * range predicate plans as. Left join + count(non-null) keeps
    * zero-match left rows; a right row's bucket equals exactly one of the
    * two probes, so nothing double-counts.
    */
  def rangeCountJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      windowUs: Long,
      leftIdCol: String): DataFrame = {
    val r = right.select(col(keyCol).as("__rk"), col(timeCol).as("__rt"))
      .withColumn("__rb", expr(s"__rt div ${windowUs}L"))
    val probes = left
      .withColumn("__lb", expr(s"$timeCol div ${windowUs}L"))
      .withColumn("__pb", explode(array(col("__lb"), col("__lb") - 1)))
    probes.join(r,
        probes(keyCol) === r("__rk") && col("__pb") === col("__rb") &&
          col("__rt") > col(timeCol) - windowUs && col("__rt") <= col(timeCol),
        "left")
      .groupBy(col(leftIdCol), col(keyCol), col(timeCol))
      .agg(count(col("__rt")).as("n_matches"))
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

  /** Cohort retention: users grouped by first-active day, counted on each
    * later active day — (cohort_day, offset_day, n_users) where both days
    * are integer offsets (cohort from `epochDate`, offset from the
    * cohort day), the triangle every growth/engagement dashboard draws.
    *
    * Shape: day-distinct activity first (collapses each user's events to
    * at most one row per day BEFORE anything joins — at 100 TB this is the
    * big reduction, and it is a pure map-side-partial aggregation), then
    * min-day per user, one narrow (user, day) x (user, cohort) equi-join,
    * and a count per (cohort, offset). Every shuffled row is two ints and
    * a user id.
    */
  /** Ordered funnel: how far does each user get through `steps`
    * (strictly increasing timestamps, step k after step k-1)? Returns
    * (stage, n_users) where stage ∈ 0..steps.length — the conversion
    * summary behind every funnel chart.
    *
    * Shape: one narrow (user, type, us) projection, then per step a
    * filtered min-aggregation joined on user — each pass shuffles only
    * (user, epoch) pairs with map-side partial MIN, and the number of
    * passes is the (small, fixed) number of funnel steps, never data
    * volume. First-event times are the tightest valid choice: for the
    * "earliest completion" semantics, taking min at each stage is optimal
    * (greedy earliest-next-step never hurts later steps).
    */
  def funnelStages(
      events: DataFrame, steps: Seq[String], timeCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty)
    val base = events.select(col("user_id"), col("event_type"),
      unix_micros(col(timeCol)).as("us"))
    val users = base.select("user_id").distinct()
    // reach(k): per user, earliest step-k event strictly after reach(k-1)
    val reach = steps.foldLeft(List.empty[DataFrame]) { (acc, step) =>
      val mine = base.filter(col("event_type") === step)
      val eligible = acc.headOption match {
        case None => mine
        case Some(p) =>
          mine.join(p.select(col("user_id"), col("t").as("pt")), "user_id")
            .filter(col("us") > col("pt"))
      }
      eligible.groupBy("user_id").agg(min("us").as("t")) :: acc
    }.reverse
    val staged = reach.zipWithIndex.foldLeft(
        users.select(col("user_id"), lit(0).as("stage"))) {
      case (acc, (r, i)) =>
        acc.join(r.select(col("user_id"), lit(i + 1).as("s")), Seq("user_id"), "left")
          .select(col("user_id"),
            greatest(col("stage"), coalesce(col("s"), lit(0))).as("stage"))
    }
    staged.groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  /** Per-user ordered training sequences: each user's event history as
    * one time-ordered token string, truncated to the LAST `maxLen`
    * events (the recent-history window sequence models train on), plus
    * the untruncated history length for downstream length-bucketing.
    * This is the events→training-example bridge: sessionize/funnel
    * aggregate history, this op SERIALIZES it.
    *
    * Order is (event time in µs, event_id) — total, deterministic, and
    * identical to the DuckDB oracle's (ns timestamps truncate to µs at
    * the scan, the e02 convention). Scale shape: the per-user state that
    * reaches the aggregation is BOUNDED — a `row_number` window filter
    * keeps only the newest `maxLen` rows per user first, so the
    * collect_list buffer holds ≤ maxLen fixed-width structs regardless
    * of how hot a bot user's history is (collecting THEN truncating
    * would build an unbounded array in one agg buffer). The window sort
    * itself is Spark's distributed per-key sort — spillable, and the
    * same per-user-history cost every op in this tier pays; a
    * pathological single user can further be bounded by a time-chunk
    * pre-filter (the e05 bucketization) before sequencing.
    */
  def userSequences(events: DataFrame, maxLen: Int): DataFrame = {
    val e = events.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val recent = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("event_id").desc)
    val whole = Window.partitionBy("user_id")
    e.withColumn("rn", row_number().over(recent))
      .withColumn("n_events", count(lit(1)).over(whole))
      .filter(col("rn") <= maxLen)
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"),
        concat_ws(",", transform(
          sort_array(collect_list(
            struct(col("us"), col("event_id"), col("event_type")))),
          s => s.getField("event_type"))).as("seq"))
  }

  /** Skew-safe [[userSequences]], result-identical (r8 — the documented
    * time-chunk bound, now implemented; the [[sessionizeSalted]] move
    * applied to sequence building). No task ever sorts one user's ENTIRE
    * history:
    *
    *  1. local pass — `row_number` over (user_id, chunk), chunk =
    *     floor(event-µs / chunkSeconds): only each chunk's newest
    *     `maxLen` events survive. Chunks partition time, so every event
    *     in a newer chunk outranks every event in an older one — an
    *     event below its own chunk's top-maxLen can never make the
    *     global top-maxLen.
    *  2. chunk relevance — over the per-(user, chunk) COUNT summaries
    *     (tiny: one row per active chunk), a running sum in
    *     newest-chunk-first order keeps only the minimal chunk suffix
    *     whose newer chunks haven't already supplied `maxLen` events.
    *     Surviving candidates per user are < 2·maxLen by construction,
    *     so the final per-user window is bounded regardless of how hot
    *     a bot user's history is.
    *  3. totals — n_events re-aggregates from the same summaries
    *     (associative count sum, the sessionizeSalted merge argument).
    */
  def userSequencesSalted(
      events: DataFrame, maxLen: Int, chunkSeconds: Long): DataFrame = {
    require(chunkSeconds > 0, s"chunkSeconds must be positive: $chunkSeconds")
    val e = events.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("chunk", expr(s"us div ${chunkSeconds * 1000000L}"))
    val byChunk = Window.partitionBy("user_id", "chunk")
      .orderBy(col("us").desc, col("event_id").desc)
    val trimmed = e.withColumn("crn", row_number().over(byChunk))
      .filter(col("crn") <= maxLen).drop("crn")
    val chunkCounts = e.groupBy("user_id", "chunk")
      .agg(count(lit(1)).as("c_events"))
    // newer-chunks-first running count over summary rows decides which
    // chunks can still contribute to the newest-maxLen set
    val newestFirst = Window.partitionBy("user_id").orderBy(col("chunk").desc)
    val relevant = chunkCounts
      .withColumn("newer", coalesce(sum(col("c_events")).over(
        newestFirst.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("newer") < maxLen)
      .select("user_id", "chunk")
    val totals = chunkCounts.groupBy("user_id")
      .agg(sum("c_events").as("n_events"))
    val recent = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("event_id").desc)
    trimmed.join(relevant, Seq("user_id", "chunk"))
      .withColumn("rn", row_number().over(recent))
      .filter(col("rn") <= maxLen)
      .groupBy("user_id")
      .agg(concat_ws(",", transform(
        sort_array(collect_list(
          struct(col("us"), col("event_id"), col("event_type")))),
        s => s.getField("event_type"))).as("seq"))
      .join(totals, "user_id")
      .select(col("user_id"), col("n_events"), col("seq"))
  }

  /** Cadence-based bot screen — the first hygiene pass before event
    * streams become training data: per user, event count, active span,
    * mean inter-event gap, and a flag for "many events at machine-tight
    * cadence". The flag compares exact INTEGERS —
    * `(n−1)·maxMeanGapSec > span ⇔ mean gap < maxMeanGapSec` — so no
    * float threshold ever decides a row (oracle bit-stability, and at
    * 100 TB a re-run classifies identically however partitions move).
    * Second granularity by the e02 truncation convention. One groupBy
    * with fixed-width agg state: skew-immune, a million-event bot user
    * costs its partial aggregates, never a buffer.
    */
  def cadenceFlags(events: DataFrame, minEvents: Long,
      maxMeanGapSec: Long): DataFrame =
    events
      .select(col("user_id"), col("ts").cast("long").as("sec"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (max("sec") - min("sec")).as("span_s"))
      .withColumn("mean_gap_s",
        col("span_s").cast("double") /
          greatest(col("n_events") - 1, lit(1L)).cast("double"))
      .withColumn("bot",
        col("n_events") >= minEvents &&
          col("span_s") < (col("n_events") - 1) * maxMeanGapSec)

  /** Top-k behavioral PATHS: the most frequent length-3 event-type
    * sequences across per-user streams ([[transitionMatrix]] is the
    * length-2 marginal; paths answer "what do users DO around a
    * purchase" where the matrix only says what follows what). Two
    * `lead`s over one per-user window build the trigram rows (both on
    * the same user_id exchange + sort), a hash agg with map-side
    * partials counts them, and the top-k is a bounded
    * TakeOrderedAndProject. Ties break lexicographically on the path.
    */
  def pathTrigrams(events: DataFrame, k: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("t2", lead("event_type", 1).over(byUser))
      .withColumn("t3", lead("event_type", 2).over(byUser))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("t2").as("s2"),
        col("t3").as("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(k)
  }

  /** CUPED variance reduction (Deng et al. 2013 — "Improving the
    * Sensitivity of Online Controlled Experiments"): per-user PRE-period
    * metric X as the covariate for the POST-period metric Y, reporting
    * θ = cov(X,Y)/var(X) and the adjusted metric variance
    * `var(Y) − cov²/var(X)` — the experimentation-platform primitive
    * that decides how much a pre-period covariate shrinks an A/B test's
    * confidence intervals.
    *
    * Oracle-exact discipline: values quantize to integer cents
    * (`round(value·100)`, the s01 convention), per-user sums are exact
    * longs, and the five moment aggregates accumulate as exact decimals
    * (products of per-user sums would overflow longs; decimal keeps
    * them exact in BOTH engines). Every derived statistic is a fixed
    * chain of IEEE ops over those exact moments — mirrored cast-point
    * for cast-point in the DuckDB oracle. Degenerate inputs (n < 2 or
    * zero covariate variance) yield NULL θ, not a division blowup.
    *
    * Shape: one scan → per-user partial-agg rollup (the only exchange,
    * keyed on user) → one single-row moment aggregation.
    */
  def cuped(events: DataFrame, splitTs: String): DataFrame = {
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val per = events.select(col("user_id"),
        when(col("ts") < lit(splitTs).cast("timestamp"),
          round(col("value") * 100).cast("long")).otherwise(0L).as("xq"),
        when(col("ts") >= lit(splitTs).cast("timestamp"),
          round(col("value") * 100).cast("long")).otherwise(0L).as("yq"))
      .groupBy("user_id").agg(sum("xq").as("x"), sum("yq").as("y"))
      .select(col("x").cast(d18).as("x"), col("y").cast(d18).as("y"))
    val m = per.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    m.select(col("n").as("n_users"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("varx_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("vary_num"))
      .select(col("n_users"),
        when(col("n_users") >= 2 && col("varx_num") =!= 0,
          col("cov_num").cast("double") / col("varx_num").cast("double"))
          .otherwise(lit(null)).as("theta"),
        when(col("n_users") >= 2,
          col("vary_num").cast("double") /
            (col("n_users") * (col("n_users") - 1)).cast("double"))
          .otherwise(lit(null)).as("var_y"),
        when(col("n_users") >= 2 && col("varx_num") =!= 0,
          (col("vary_num").cast("double") /
            (col("n_users") * (col("n_users") - 1)).cast("double")) -
          (col("cov_num").cast("double") /
            (col("n_users") * (col("n_users") - 1)).cast("double")) *
          (col("cov_num").cast("double") /
            (col("n_users") * (col("n_users") - 1)).cast("double")) /
          (col("varx_num").cast("double") /
            (col("n_users") * (col("n_users") - 1)).cast("double")))
          .otherwise(lit(null)).as("var_y_adj"))
  }

  /** CUSUM change-point detector (Page 1954): the LEVEL-SHIFT rung of
    * the monitoring ladder — [[hourlyAnomaly]] flags single outlier
    * hours against the whole series, [[ewmaAnomaly]] flags bursts
    * against the recent past; CUSUM accumulates SMALL persistent
    * deviations until a sustained mean shift crosses a decision
    * interval, which is what catches a slow regression neither z nor
    * EWMA sees.
    *
    * Exactness: the classic recursion S_t = max(0, S_{t-1} + x_t − μ
    * − slack) is not window-expressible directly, but unrolls exactly
    * to `S_t = P_t − min(0, min_{j≤t} P_j)` over the prefix sums P of
    * the drift-corrected deviations — two stacked windows (running
    * sum, running min), no recursion. With slack = μ/4 and decision
    * interval h = 2μ, everything clears to integers scaled by 4c:
    * D_t = 4·c·n_t − 5·s (c hours, s total count per type), flag when
    * S_t > 8·s — exact longs end to end; the REPORTED cusum (in count
    * units) is one IEEE division by 4c. Computed on the zero-filled
    * dense hour spine (a silent hour IS evidence of a downward shift).
    *
    * Shape: the e25 rollup+spine, one tiny per-type moment join, two
    * windows over type×hours rows. Magnitudes hold while 8·c·max(n)·
    * hours < 2^63.
    */
  /** RFM segmentation (Hughes 1994, "Strategic Database Marketing" —
    * the classic recency/frequency/monetary customer triage every
    * warehouse runs): per purchasing user, days since last purchase
    * (relative to the corpus' own max purchase time — a deterministic
    * anchor, no wall clock), purchase count, and exact-decimal spend,
    * each scored into rank-space quintiles (5 = best) and folded into
    * a standard segment taxonomy (champion / loyal / big_spender /
    * at_risk / hibernating / recent / regular — CASE arms evaluated in
    * that order).
    *
    * Quintiles WITHOUT a one-task global window: scores come straight
    * from dense global ranks ([[Corpus.contiguousIdsBy]] — range
    * partition + local counters + broadcast offsets), score =
    * `rank·5 div n + 1` (recency inverted), so no cutoff extraction
    * and no ntile. Ties break by (metric, user_id) — equal metric
    * values can land in adjacent quintiles either side of a boundary,
    * but the assignment is DETERMINISTIC and the oracle replays it
    * rank-for-rank. All arithmetic integer/decimal until the monetary
    * display cast.
    *
    * Scale: one purchase-filtered rollup (map-side combine) reduces to
    * user-cardinality rows; three contiguousIdsBy passes over THAT
    * frame (users ≪ events); two 1-row broadcasts. Nothing holds more
    * than the per-user frame.
    */
  def rfmSegments(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("value"))
    val perUser = purchases.groupBy("user_id")
      .agg(max("es").as("last_es"),
        count(lit(1)).as("frequency"),
        sum(col("value").cast(DecimalType(18, 6))).as("monetary_d"))
    val anchor = purchases.agg(max("es").as("anchor_es"))
    val nUsers = perUser.agg(count(lit(1)).as("n_users"))
    val base = perUser.crossJoin(broadcast(anchor))
      .withColumn("recency_days", expr("(anchor_es - last_es) div 86400"))
    val ranked = Corpus.contiguousIdsBy(
      Corpus.contiguousIdsBy(
        Corpus.contiguousIdsBy(base,
          Seq("recency_days", "user_id"), "rk_r"),
        Seq("frequency", "user_id"), "rk_f"),
      Seq("monetary_d", "user_id"), "rk_m")
    val scored = ranked.crossJoin(broadcast(nUsers))
      .withColumn("r_score", lit(5L) - expr("(rk_r * 5) div n_users"))
      .withColumn("f_score", expr("(rk_f * 5) div n_users") + lit(1L))
      .withColumn("m_score", expr("(rk_m * 5) div n_users") + lit(1L))
    scored.select(col("user_id"), col("recency_days"), col("frequency"),
      col("monetary_d").cast("double").as("monetary"),
      col("r_score"), col("f_score"), col("m_score"),
      when(col("r_score") >= 4 && col("f_score") >= 4 &&
          col("m_score") >= 4, lit("champion"))
        .when(col("f_score") >= 4, lit("loyal"))
        .when(col("m_score") >= 4, lit("big_spender"))
        .when(col("r_score") <= 2 && col("f_score") >= 3, lit("at_risk"))
        .when(col("r_score") <= 2, lit("hibernating"))
        .when(col("r_score") >= 4, lit("recent"))
        .otherwise(lit("regular")).as("segment"))
  }

  /** Theil–Sen robust trend + Mann–Kendall S per event type (Theil
    * 1950; Sen 1968; Mann 1945; Kendall 1975 — the NONPARAMETRIC trend
    * rung of the monitoring family: e25/e28/e29 detect bursts, shifts
    * and seasonal outliers, this estimates the underlying monotone
    * DRIFT in a way a single spike cannot drag, where an OLS slope —
    * one corrupted hour — can move arbitrarily; Theil–Sen's breakdown
    * point is ~29%). Estimator: the exact median of all pairwise
    * slopes (n_b − n_a)/(h_b − h_a) over the hourly count series;
    * Mann–Kendall S = Σ sign(n_b − n_a) over the same pairs is the
    * classic companion significance statistic (S near ±n_pairs ⇒
    * consistent monotone trend).
    *
    * Exactness: hour indices and count diffs are integers; each slope
    * is ONE IEEE division; the median picks the one or two middle
    * ranks by row_number over (slope, h_a, h_b) — equal slopes make
    * the tiebreak value-irrelevant — and averages them (≤ 2 doubles:
    * one add + one divide, bit-identical in DuckDB). S stays a long.
    *
    * Scale: the only corpus-sized pass is the hourly rollup (map-side
    * combine); pair work is per-type C(H,2) where H is the SERIES
    * length — bounded by the time horizon, never by event rows. The
    * lookback bound is EXECUTABLE (r15 — the r14 verdict's #2: the
    * e28 convention lived in prose): `maxHours` clips each type to its
    * TRAILING maxHours hours before the pair join, because the median
    * window holds C(H,2) rows in ONE task per event type (~345M pair
    * rows at a 3-year hourly horizon). The default (8784 = 366 days)
    * caps that task at ~38.6M fixed-width rows; longer horizons must
    * choose their window explicitly. The clip is a series-sized
    * window max + filter — one pass over type×hours rows.
    */
  def theilSenTrend(events: DataFrame, maxHours: Int = 8784): DataFrame = {
    require(maxHours >= 2,
      s"maxHours=$maxHours cannot form a slope pair")
    val hourlyAll = events.groupBy(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("long").as("h"))
      .agg(count(lit(1)).as("n"))
    // r15: repartition the clipped series by type BEFORE the pair join.
    // The rollup output is a few KB, so AQE coalesces the pre-join
    // exchanges to ONE partition — but the join EXPLODES to C(H,2) rows
    // per type, which AQE's byte heuristic cannot see, so the join, the
    // rank window and the median aggregation all ran in a single task
    // (measured 2×2.5 s single-task stages at sf0.1). A user repartition
    // by the join/window key caps the damage at types-many tasks; at any
    // scale the frame is series-sized (types × maxHours rows), so the
    // exchange is noise.
    val hourly = hourlyAll
      // placed BEFORE the clip window so this user exchange IS the
      // window's required event_type distribution (an exchange added
      // after the window is pruned as redundant, and the window's own
      // ENSURE_REQUIREMENTS exchange is then AQE-coalesced to one
      // partition on KB-sized input — the explicit partition count pins
      // it, because the downstream pair join EXPLODES to C(H,2) rows per
      // type, which AQE's byte heuristic cannot anticipate)
      .repartition(events.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt, col("event_type"))
      .withColumn("mxh", max("h").over(Window.partitionBy("event_type")))
      .filter(col("h") > col("mxh") - maxHours).drop("mxh")
    val a = hourly.as("a"); val b = hourly.as("b")
    val pairs = a.join(b,
        col("a.event_type") === col("b.event_type") &&
          col("a.h") < col("b.h"))
      .select(col("a.event_type").as("event_type"),
        (col("b.n") - col("a.n")).as("dn"),
        (col("b.h") - col("a.h")).as("dh"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      .withColumn("slope",
        col("dn").cast("double") / col("dh").cast("double"))
    val byType = Window.partitionBy("event_type")
    val ranked = pairs
      .withColumn("rn", row_number().over(
        byType.orderBy(col("slope"), col("ha"), col("hb"))))
      .withColumn("m", count(lit(1)).over(byType))
    // r15: ONE aggregation over the ranked frame computes the median,
    // n_pairs AND Mann–Kendall S together. The former separate `agg`
    // branch re-executed the whole C(H,2) pair join a second time (pairs
    // is lazy and was consumed by two independent subtrees — measured as
    // two parallel 2.1 s single-task stages at sf0.1); n_pairs == m on
    // every row of a type, and S is a plain sum, so both fold into the
    // same pass that picks the middle ranks. Values are bit-identical:
    // same rank tiebreak, same ≤2-double median average.
    val nh = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"))
    val stats = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum(signum(col("dn")).cast("long")).as("mk_s"),
        (sum(when(expr("rn = (m + 1) div 2 OR rn = (m + 2) div 2"),
          col("slope"))) /
          count(when(expr("rn = (m + 1) div 2 OR rn = (m + 2) div 2"),
            lit(1)))).as("ts_slope"))
    nh.join(stats, "event_type")
      .select(col("event_type"), col("n_hours"), col("n_pairs"),
        col("mk_s"), col("ts_slope"))
  }

  def cusumShift(events: DataFrame): DataFrame = {
    val hourly = events.groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("cnt"))
    val spine = hourly.groupBy("event_type")
      .agg(min("h").as("mn"), max("h").as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), lit(3600L))).as("h"))
    val dense = spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("cnt"), lit(0L)).as("n"))
    val stats = dense.groupBy("event_type")
      .agg(count(lit(1)).as("c"), sum("n").as("s"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(broadcast(stats), "event_type")
      .withColumn("d", lit(4L) * col("c") * col("n") - lit(5L) * col("s"))
      .withColumn("p", sum("d").over(w))
      .withColumn("cusum_num",
        col("p") - least(min("p").over(w), lit(0L)))
      .select(col("event_type"), col("h").as("hour_epoch"), col("n"),
        col("cusum_num"),
        (col("cusum_num").cast("double") / (lit(4L) * col("c")))
          .as("cusum"),
        when(col("cusum_num") > lit(8L) * col("s"), lit(1))
          .otherwise(lit(0)).as("shift_flag"))
  }

  /** Offline single change-point localization per event type — the
    * batch complement of [[cusumShift]]'s sequential detector: cusum
    * flags THAT the level shifted while monitoring; this names WHERE,
    * over the full daily history, the series most likely split into
    * two regimes (maximum-likelihood mean-shift estimate, equivalent
    * to the argmax of the CUSUM deviation |S_k − (k/n)·S_n|) — the
    * retrospective read a postmortem or a data-drift audit wants.
    *
    * Exactness: daily counts on a DENSE calendar (gap days are real
    * zeros, same spine discipline as cusumShift), prefix sums exact
    * longs, and the argmax ranks the INTEGER statistic d_k =
    * |n·S_k − k·S_n| (ties → earliest day), so the split day never
    * depends on floating point. Means and the normalized statistic
    * d_k / (n·√(k(n−k))) are one fixed IEEE expression each, replayed
    * cast-for-cast by the oracle — hash-exact.
    *
    * Scale: one corpus-sized rollup with map-side combine; everything
    * after runs on the types × days frame (calendar-bounded). The
    * per-type window sort holds days-per-type rows — thousands, not
    * billions; skew cannot arise because the key is the calendar.
    */
  def changepoint(events: DataFrame): DataFrame = {
    val daily = events.groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("day"))
      .agg(count(lit(1)).as("cnt"))
    val spine = daily.groupBy("event_type")
      .agg(min("day").as("mn"), max("day").as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
    val dense = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("cnt"), lit(0L)).as("n"))
    val tot = dense.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum("n").as("s_tot"))
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val scored = dense.join(broadcast(tot), "event_type")
      .withColumn("k", row_number().over(byDay).cast("long"))
      .withColumn("s_k", sum("n").over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("k") < col("nd")) // interior splits only
      .withColumn("d", abs(col("nd") * col("s_k") - col("k") * col("s_tot")))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("d").desc, col("k").asc)))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("nd").as("n_days"), col("k"),
        (col("s_k").cast("double") / col("k").cast("double"))
          .as("mean_before"),
        ((col("s_tot") - col("s_k")).cast("double") /
          (col("nd") - col("k")).cast("double")).as("mean_after"),
        (col("d").cast("double") / (col("nd").cast("double") *
          sqrt(col("k").cast("double") *
            (col("nd") - col("k")).cast("double")))).as("cusum_stat"))
  }

  /** Group-sequential experiment monitor (Pocock 1977 / O'Brien &
    * Fleming 1979): the "peek correctly" rung above [[welchT]]'s
    * single-look decision — reading a fixed-α test daily inflates the
    * false-positive rate several-fold; a group-sequential boundary
    * spends α across the looks instead. Each DAY with data is a look:
    * cumulative two-sample z over everything seen so far, compared to
    * the OBF-shaped boundary `boundC · sqrt(D / d)` (strict early, ≈
    * boundC at the final look; boundC = 2.797 is the classic K≈5
    * α=0.05 OBF constant — tune per design).
    *
    * Exactness: observations are integer-quantized by the caller (the
    * e21/e23 cent convention); per-(day, arm) moments are exact
    * decimal sums; the cumulative moments are window prefix-sums of
    * those exact values, and z, the boundary, and the crossing flag
    * are a fixed IEEE chain replayed cast-for-cast by the oracle.
    * Looks with an arm under 2 cumulative observations (or zero
    * pooled variance) read NULL z and never flag.
    *
    * Shape: ONE corpus-sized (day, arm) rollup with map-side combine;
    * everything after runs on the looks×2 frame (the cum window's
    * single partition holds ~days rows — bounded by the calendar).
    */
  def sequentialMonitor(obs: DataFrame, dayCol: String,
      variantCol: String, xCol: String,
      boundC: Double = 2.797): DataFrame = {
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val per = obs.select(col(dayCol).as("day"),
        col(variantCol).as("variant"), col(xCol).cast(d18).as("x"))
      .groupBy("day", "variant")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("q"))
    def side(v: Int, suf: String) = per.filter(col("variant") === v)
      .select(col("day"), col("n").as(s"n$suf"), col("s").as(s"s$suf"),
        col("q").as(s"q$suf"))
    val z0 = lit(new java.math.BigDecimal(0)).cast(d18)
    val j = side(0, "0").join(side(1, "1"), Seq("day"), "full")
      .select(col("day"),
        coalesce(col("n0"), lit(0L)).as("n0"),
        coalesce(col("s0"), z0).as("s0"),
        coalesce(col("q0"), z0).as("q0"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("s1"), z0).as("s1"),
        coalesce(col("q1"), z0).as("q1"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = j.select(col("day"),
      sum("n0").over(w).as("cn0"), sum("s0").over(w).as("cs0"),
      sum("q0").over(w).as("cq0"),
      sum("n1").over(w).as("cn1"), sum("s1").over(w).as("cs1"),
      sum("q1").over(w).as("cq1"),
      row_number().over(Window.orderBy("day")).as("look"),
      count(lit(1)).over(
        Window.orderBy("day").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
        .as("looks"))
    def m(s: Column, n: Column) = s.cast("double") / n
    def v(q: Column, s: Column, n: Column) =
      when(n >= 2, (q.cast("double") - s.cast("double") * s.cast("double") / n)
        / (n - 1)).otherwise(lit(null).cast("double"))
    val se2 = v(col("cq0"), col("cs0"), col("cn0")) / col("cn0") +
      v(col("cq1"), col("cs1"), col("cn1")) / col("cn1")
    val z = when(se2.isNotNull && se2 > 0,
      (m(col("cs1"), col("cn1")) - m(col("cs0"), col("cn0"))) / sqrt(se2))
      .otherwise(lit(null).cast("double"))
    val bound = lit(boundC) *
      sqrt(col("looks").cast("double") / col("look").cast("double"))
    c.select(col("day"), col("look").cast("long").as("look"),
      col("cn0").as("n_0"),
      col("cn1").as("n_1"), z.as("z"), bound.as("bound"),
      when(z.isNotNull && abs(z) > bound, lit(1)).otherwise(lit(0))
        .as("crossed"))
  }

  /** Difference-in-differences estimator (Card & Krueger 1994 made it
    * the quasi-experimental workhorse): with a PANEL unit frame — one
    * row per unit carrying its quantized pre-period and post-period
    * metric plus a variant flag — the 2×2 estimate
    * `(post_T − pre_T) − (post_C − pre_C)` nets out both the common
    * time trend and the fixed group gap. For panel data the estimator
    * and its uncertainty reduce EXACTLY to a two-sample Welch t on the
    * per-unit period DIFFS (d = post − pre), so the t machinery here
    * is [[welchT]]'s formula on d.
    *
    * Exactness: inputs are integer-quantized longs (the e21/e23 cent
    * convention); sums and sums-of-squares accumulate as exact
    * decimals; every reported float (4 cell means, did, t) is a fixed
    * IEEE expression tree the oracle replays cast-for-cast. Arms with
    * n < 2 (or zero diff variance) read NULL t; a missing arm reads
    * NULL everywhere but the present arm's cells.
    *
    * Shape: one unit-level rollup to per-arm moments (≤ 2 fixed-width
    * rows), then a 1×1 join — nothing after the rollup scales.
    */
  def did(units: DataFrame, variantCol: String, preCol: String,
      postCol: String): DataFrame = {
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val per = units.select(col(variantCol).as("variant"),
      col(preCol).cast(d18).as("x"), col(postCol).cast(d18).as("y"),
      (col(postCol) - col(preCol)).cast(d18).as("d"))
    val arm = per.groupBy("variant").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum("d").as("sd"), sum(col("d") * col("d")).as("qd"))
    def cells(v: Int, suf: String) = arm.filter(col("variant") === v)
      .select(col("n").as(s"n$suf"), col("sx").as(s"sx$suf"),
        col("sy").as(s"sy$suf"), col("sd").as(s"sd$suf"),
        col("qd").as(s"qd$suf"))
    def mean(s: Column, n: Column) = s.cast("double") / n
    val j = cells(0, "0").join(cells(1, "1"), lit(true), "full")
    val md0 = mean(col("sd0"), col("n0"))
    val md1 = mean(col("sd1"), col("n1"))
    def dvar(q: Column, s: Column, n: Column) =
      when(n >= 2, (q.cast("double") - s.cast("double") * s.cast("double") / n)
        / (n - 1)).otherwise(lit(null).cast("double"))
    val se2 = dvar(col("qd0"), col("sd0"), col("n0")) / col("n0") +
      dvar(col("qd1"), col("sd1"), col("n1")) / col("n1")
    j.select(
      coalesce(col("n0"), lit(0L)).as("n_0"),
      coalesce(col("n1"), lit(0L)).as("n_1"),
      mean(col("sx0"), col("n0")).as("mean_pre_0"),
      mean(col("sy0"), col("n0")).as("mean_post_0"),
      mean(col("sx1"), col("n1")).as("mean_pre_1"),
      mean(col("sy1"), col("n1")).as("mean_post_1"),
      ((mean(col("sy1"), col("n1")) - mean(col("sx1"), col("n1"))) -
        (mean(col("sy0"), col("n0")) - mean(col("sx0"), col("n0"))))
        .as("did"),
      when(se2.isNotNull && se2 > 0, (md1 - md0) / sqrt(se2))
        .otherwise(lit(null).cast("double")).as("t_stat"))
  }

  /** Sample-ratio-mismatch check (the experimentation platform's first
    * trust gate — Fabijan et al. 2019, "Diagnosing Sample Ratio
    * Mismatch"; [[cuped]] shrinks an experiment's variance, THIS
    * decides whether its randomization can be trusted at all): per
    * experiment, Pearson's chi-square of the observed unit counts per
    * variant against the design `weights`, flagging when the statistic
    * exceeds `critical` (default 3.841 = the df=1 / α=0.05 cut for
    * two-variant tests; pass the df=k−1 value for more arms).
    *
    * Oracle-exact arithmetic: with W = Σ weights, each variant's term
    * clears to `(W·O_i − n·w_i)² / (W·n·w_i)` — integer numerator and
    * denominator (magnitudes hold while (W·n)² < 2^63 — beyond ~10^9
    * units, pre-scale the weights), ONE IEEE division per variant,
    * DECIMAL(18,6) accumulation (the dsum convention). A design
    * variant with zero observations still contributes its full
    * expected-count term; exposures under variants NOT in the design
    * are never silently folded in — they are excluded from n and
    * reported per experiment as `n_unknown` (a nonzero value is itself
    * an assignment bug). Experiments with no known-variant exposures
    * read NULL chi2.
    *
    * `exposures` must be UNIT-level (one row per experiment × unit —
    * dedup upstream; SRM counts units, not events). Shape: one
    * (experiment, variant) partial-agg rollup — fixed-width rows, at
    * most experiments × variants of them — then experiment-keyed
    * joins against the broadcast design grid. Nothing scales beyond
    * the rollup's exchange.
    */
  def srmCheck(
      exposures: DataFrame, expCol: String, variantCol: String,
      weights: Seq[(Long, Long)],
      critical: Double = 3.841): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate variant in weights: $weights")
    val wTot = weights.map(_._2).sum
    val spark = exposures.sparkSession
    val wDf = broadcast(
      spark.createDataFrame(weights).toDF("variant", "wgt"))
    val obs = exposures
      .select(col(expCol).as("exp"), col(variantCol).cast("long")
        .as("variant"))
      .groupBy("exp", "variant").agg(count(lit(1)).as("o"))
    val unknown = obs
      .join(wDf.select("variant"), Seq("variant"), "left_anti")
      .groupBy("exp").agg(sum("o").as("n_unknown"))
    val grid = obs.select("exp").distinct().crossJoin(wDf)
    val joined = grid.join(obs, Seq("exp", "variant"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val nPer = joined.groupBy("exp").agg(sum("o").as("n"))
    val chi = joined.join(nPer, Seq("exp"))
      .withColumn("num",
        lit(wTot) * col("o") - col("n") * col("wgt"))
      .withColumn("term",
        // n = 0 (an experiment seen only under unknown variants) would
        // divide 0/0; keep the row NULL and surface it via chi2
        when(col("n") === 0, lit(null))
          .otherwise(((col("num") * col("num")).cast("double") /
            (lit(wTot) * col("n") * col("wgt")).cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))))
      .groupBy("exp").agg(max("n").as("n_units"),
        sum("term").cast("double").as("chi2raw"))
    chi.join(unknown, Seq("exp"), "left")
      .select(col("exp").as(expCol),
        col("n_units"),
        when(col("n_units") === 0, lit(null))
          .otherwise(col("chi2raw")).as("chi2"),
        when(col("n_units") === 0, lit(null))
          .otherwise(col("chi2raw") > critical).as("srm"),
        coalesce(col("n_unknown"), lit(0L)).as("n_unknown"))
  }

  /** Welch's unequal-variance t-test (Welch 1947) — the experiment
    * DECISION beside [[srmCheck]]'s trust gate and the CUPED variance
    * reducer: given one row per (experiment, unit) with a two-arm
    * `variant` (0 = control, 1 = treatment) and an INTEGER-QUANTIZED
    * metric (the caller pre-quantizes — cents, not dollars — the
    * t16/t27 discipline), report per experiment the arm sizes, means,
    * sample variances, the t statistic and the Welch–Satterthwaite
    * degrees of freedom.
    *
    * Oracle exactness: Σx and Σx² accumulate as EXACT longs (the only
    * order-sensitive step), so the float chain on top — mean `S/n`,
    * variance `(Q − S·S/n)/(n−1)`, `t = (m₀−m₁)/√(v₀/n₀+v₁/n₁)`, the
    * df ratio — is a fixed expression tree of correctly-rounded IEEE
    * ops that DuckDB replays bit-for-bit. Magnitudes hold while
    * n·max(x)² < 2⁶³ (~10⁹ units at 10⁵-cent metrics — pre-scale the
    * quantization beyond that). Arms with n < 2 or a zero pooled
    * standard error yield NULL t/df (undefined, never ±Inf).
    *
    * Shape: ONE fixed-width (experiment, variant) partial-agg rollup
    * — map-side combine does the real work, the exchange carries at
    * most experiments × 2 rows — then a self-join of the two arm rows
    * per experiment. Nothing downstream scales with units.
    */
  def welchT(units: DataFrame, expCol: String, variantCol: String,
      metricCol: String): DataFrame = {
    require(units.schema(metricCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$metricCol must be an integer-quantized LONG metric")
    val arm = units
      .select(col(expCol).as("exp"),
        col(variantCol).cast("long").as("variant"),
        col(metricCol).as("x"))
      .filter(col("variant").isin(0L, 1L))
      .groupBy("exp", "variant")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("q"))
      .withColumn("m", col("s").cast("double") / col("n"))
      .withColumn("v",
        when(col("n") < 2, lit(null)).otherwise(
          (col("q").cast("double") -
            col("s").cast("double") * col("s").cast("double") /
              col("n")) / (col("n") - 1)))
    val a0 = arm.filter(col("variant") === 0L)
      .select(col("exp"), col("n").as("n_0"), col("m").as("mean_0"),
        col("v").as("var_0"))
    val a1 = arm.filter(col("variant") === 1L)
      .select(col("exp"), col("n").as("n_1"), col("m").as("mean_1"),
        col("v").as("var_1"))
    a0.join(a1, Seq("exp"), "full")
      .withColumn("se2",
        col("var_0") / col("n_0") + col("var_1") / col("n_1"))
      .select(col("exp").as(expCol),
        coalesce(col("n_0"), lit(0L)).as("n_0"),
        coalesce(col("n_1"), lit(0L)).as("n_1"),
        col("mean_0"), col("mean_1"), col("var_0"), col("var_1"),
        when(col("se2").isNull || col("se2") <= 0, lit(null))
          .otherwise((col("mean_0") - col("mean_1")) / sqrt(col("se2")))
          .as("t_stat"),
        when(col("se2").isNull || col("se2") <= 0, lit(null))
          .otherwise(col("se2") * col("se2") /
            ((col("var_0") / col("n_0")) * (col("var_0") / col("n_0")) /
              (col("n_0") - 1) +
             (col("var_1") / col("n_1")) * (col("var_1") / col("n_1")) /
              (col("n_1") - 1)))
          .as("df"))
  }

  /** SCD2 history-table construction (Kimball type-2 dimension from a
    * change log): collapse each user's event stream into validity
    * intervals of their tracked state (here `event_type` — the
    * dimension attribute whose changes matter), emitting one row per
    * state RUN with `[valid_from_us, valid_to_us)` microsecond bounds,
    * open-ended (`NULL`, `is_current`) for the live state. The standard
    * warehouse shape an AS-OF consumer joins against ([[asofJoin]] is
    * the query-side twin: THIS materializes the history, THAT probes
    * it).
    *
    * Two windows over the same per-user ordering — run-start detection
    * (`lag`), then interval close (`lead` over the CHANGE rows only) —
    * both partition on user_id alone, so one exchange serves both
    * (Spark reuses the (user_id, sorted) child; the e17 lesson).
    * Microsecond epochs (`unix_micros`) keep the bounds exact longs —
    * never raw timestamps across the harness boundary. Deterministic
    * under ts ties via the event_id tiebreak.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val changes = events
      .withColumn("__prev", lag("event_type", 1).over(byUser))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
    changes
      .withColumn("__to", lead("ts", 1).over(byUser))
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("valid_from_us"),
        expr("unix_micros(__to)").as("valid_to_us"),
        col("__to").isNull.as("is_current"))
  }

  def retentionCohorts(events: DataFrame, epochDate: String): DataFrame = {
    val act = events
      .select(col("user_id"), datediff(to_date(col("ts")),
        to_date(lit(epochDate))).as("day"))
      .distinct()
    val cohorts = act.groupBy("user_id").agg(min("day").as("cohort_day"))
    act.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_day"))
      .agg(count(lit(1)).as("n_users")) // (user, day) is distinct already
  }

  /** Rolling active users: for every day with activity, the distinct
    * users active that day (DAU) and in the `windowDays`-day window
    * ending that day (WAU/MAU as the window dial) — the
    * engagement-denominator pair behind every events dashboard.
    *
    * Distinct-over-a-sliding-window does not decompose into partial
    * aggs, so the scalable shape is: collapse to DISTINCT (user, day)
    * pairs FIRST (the big map-side reduction — raw events never reach
    * the window logic), then explode each pair to the `windowDays`
    * target days it activates (bounded ×7/×30 fan-out of the SMALL
    * frame), de-dup (user, target-day), and count — a per-day count,
    * never a giant count_distinct window. The join back to real days
    * drops the synthetic trailing days the explode manufactures.
    */
  def rollingActive(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val ud = events.select(col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("day"))
      .distinct()
    val dau = ud.groupBy(col("day").as("d"))
      .agg(count(lit(1)).as("dau")) // (user, day) already distinct
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + (windowDays - 1))).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("d"))
  }

  /** Inter-event gap percentiles per event type: for each user's
    * time-ordered stream, the gap (µs) from the previous event; grouped
    * by the LATER event's type with exact p50/p90 — the cadence/latency
    * profile that sizes session-gap thresholds (e02), lookback horizons
    * (e05), and bot screens (e13), instead of guessing them.
    *
    * Shape: one per-user window (lag over (ts, event_id) — ties broken
    * like every other per-user op here; the e14 time-chunk salting
    * applies unchanged if one user dominates) then a LOW-CARDINALITY
    * (event types) exact-percentile rollup of integer µs gaps — the t05
    * convention: exact is the oracle config, `approx_percentile`'s
    * mergeable t-digest the high-cardinality swap. Gaps stay exact
    * longs; each percentile is one interpolated division both engines
    * compute identically (the p08 precedent).
    */
  def interEventGaps(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("event_type"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(byUser)).as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        percentile(col("gap_us"), lit(0.5)).as("p50_us"),
        percentile(col("gap_us"), lit(0.9)).as("p90_us"))
  }

  /** Markov transition profile over per-user event streams: global
    * (prev_type → next_type) counts and the conditional probability
    * P(next | prev) — the first-order sequence signature that feeds
    * bot screens (an automaton's transitions are near-deterministic),
    * funnel design, and next-event baselines.
    *
    * Shape: ONE per-user lag window ((ts, event_id) order — the e15
    * convention, e14's time-chunk salting applies unchanged), then a
    * type²-cardinality rollup with map-side partials. The probability
    * is a single IEEE division of two exact longs (the window sum runs
    * over the tiny rolled-up frame, never the raw events) — bit-exact
    * in any engine.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val counts = events
      .select(col("event_type").as("next_type"),
        lag(col("event_type"), 1).over(byUser).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
    val perPrev = Window.partitionBy("prev_type")
    counts.withColumn("p",
      col("n").cast("double") / sum("n").over(perPrev).cast("double"))
  }

  /** Daily gap-fill + forward fill: regularize each user's event stream
    * onto a dense daily grid from their first to their last active day —
    * the resample step every per-user time-series feature (activity
    * curves, churn features, training-example calendars) needs before a
    * fixed-length model can read it. Emits, per (user, day):
    * `n_events` (0 on silent days), `last_type` (the most recent event
    * type at or before that day — forward-filled), and `days_since`
    * (days since the user's last active day; 0 on active days).
    *
    * Scale shape: the grid explode is `sequence(min_day, max_day)` per
    * user — fan-out bounded by the corpus's calendar span (a constant:
    * ~365/year) and never by event count, so output rows are
    * O(users × span_days) however hot any user is. Both branch
    * exchanges hash on user_id ALONE (the explicit repartition below):
    * hashpartitioning(user_id) satisfies ClusteredDistribution for the
    * (user_id, day) rollup, the span agg, the grid⋈daily join (user_id
    * is a join key on both sides), and the forward-fill window — so
    * after Catalyst prunes each branch to its own narrow projection,
    * NOTHING downstream re-exchanges: exactly two user_id hash
    * exchanges of narrow rows, zero range exchanges (PlanSpec-pinned).
    * The window is a running `last(_, ignoreNulls)` over ≤ span_days
    * rows per user; the per-day "last event of the day" argmax is
    * `max(struct(us, event_id, type))` — a hash-agg with map-side
    * partials, never a per-day sort (the d18 keep-best idiom).
    */
  /** EWMA-smoothed hourly volume anomaly monitor: the RECENCY-weighted
    * rung above [[hourlyAnomaly]]'s whole-series z-scores — a z-score
    * flags "unusual vs the whole history" (a slow ramp re-baselines
    * it), while an exponentially-weighted trailing mean flags "unusual
    * vs the last few hours", which is what a burst detector wants.
    *
    * Exactness: the classic EWMA recursion is float-unfriendly
    * (alpha^k compounds rounding differently per engine), so this is
    * the TRUNCATED integer form — weights 2^(lags-1)..2^0 over the
    * previous `lags` hours with fixed denominator 2^lags - 1. The
    * weighted sum stays an exact long; the spike test
    * `n > boost * ewma` is integer cross-multiplication
    * `n * (2^lags - 1) > boost * num`; only the REPORTED ewma value is
    * one IEEE division. Gap hours are zero-filled on a per-type dense
    * hour spine first (lag() over a sparse series would silently skip
    * silent hours — the e17 lesson); the first `lags` spine hours have
    * no full window and report NULL/0.
    *
    * Scale: the only corpus-sized reduction is the raw→hourly rollup
    * (map-side combine, e01's shape); spine, window, and flags run
    * over type×hours rows (bounded: ~9k/year/type).
    */
  def ewmaAnomaly(events: DataFrame, lags: Int = 8, boost: Int = 3)
      : DataFrame = {
    require(lags >= 1 && lags <= 62, "lags must fit a long weight")
    val hourly = events.groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("cnt"))
    val spine = hourly.groupBy("event_type")
      .agg(min("h").as("mn"), max("h").as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), lit(3600L))).as("h"))
    val dense = spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("cnt"), lit(0L)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("h")
    // null until all `lags` predecessors exist (null propagation)
    val num = (1 to lags)
      .map(i => lit(1L << (lags - i)) * lag(col("n"), i).over(w))
      .reduce(_ + _)
    val den = (1L << lags) - 1
    dense
      .select(col("event_type"), col("h").as("hour_epoch"), col("n"),
        num.as("ewma_num"))
      .select(col("event_type"), col("hour_epoch"), col("n"),
        col("ewma_num"),
        (col("ewma_num").cast("double") / den).as("ewma"),
        when(col("ewma_num").isNotNull &&
            col("n") * den > lit(boost.toLong) * col("ewma_num"), lit(1))
          .otherwise(lit(0)).as("spike"))
  }

  /** Seasonal (hour-of-day) volume anomaly monitor — the rung the
    * whole-series z-score ([[hourlyAnomaly]]) and the recency EWMA
    * ([[ewmaAnomaly]]) both miss: traffic with a daily cycle makes every
    * quiet night hour an "anomaly" under a whole-series baseline and
    * every morning ramp a "burst" under a trailing mean. The seasonal
    * baseline compares each hour against the SAME slot on other days
    * (the seasonal-naive decomposition, Hyndman & Athanasopoulos, FPP
    * §3.1/§5.4), so only deviation from the profile flags. Completes
    * the monitoring ladder: point outliers (e11), bursts vs the recent
    * past (e25), sustained small shifts (e28), cycle-relative here.
    *
    * Exactness: identical discipline to [[hourlyAnomaly]] — per
    * (type, slot) moments stay exact integers (c, Σn, Σn²) over the
    * ZERO-FILLED dense hour spine (a slot that is usually silent must
    * count its zeros — the e17/e25 lesson), and the z is the same ONE
    * fixed double expression. Degenerate slots (c ≤ 1 or zero variance)
    * read NULL, never NaN/Inf.
    *
    * Scale: the only corpus-sized reduction is the raw→hourly rollup
    * (map-side combine); spine, slot moments (24·types rows, broadcast
    * back), and flags run over type×hours rows.
    */
  def seasonalAnomaly(events: DataFrame): DataFrame =
    seasonalAnomalyFromHourly(events.groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("cnt")))

  /** [[seasonalAnomaly]]'s finisher over a PRE-BUILT `(event_type, h,
    * cnt)` hourly cell frame — the standing-state shape: a streaming
    * ingest maintains exactly these cells
    * ([[graft.streaming.EventPipeline.hourlyCounts]] keyed the same
    * way), so the seasonal monitor reads off the live sink without
    * re-scanning raw events (the unitMetricStream/welchT read-side
    * finisher contract, applied to the monitoring ladder).
    */
  def seasonalAnomalyFromHourly(hourly: DataFrame): DataFrame = {
    // the cells side re-aliases its join columns (fresh exprIds): a
    // memory-sink VIEW fed in twice (spine derives from the same frame)
    // would otherwise self-join on conflicting references
    val spine = hourly.groupBy("event_type")
      .agg(min("h").as("mn"), max("h").as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), lit(3600L))).as("h"))
    val cells = hourly.select(col("event_type").as("et2"),
      col("h").as("h2"), col("cnt"))
    val dense = spine.join(cells,
        col("event_type") === col("et2") && col("h") === col("h2"), "left")
      .select(col("event_type"), col("h"),
        expr("(h % 86400) div 3600").as("slot"),
        coalesce(col("cnt"), lit(0L)).as("n"))
    val stats = dense.groupBy("event_type", "slot")
      .agg(count(lit(1)).as("c"), sum("n").as("s"),
        sum(col("n") * col("n")).as("q"))
      .select(col("event_type").as("et3"), col("slot").as("sl3"),
        col("c"), col("s"), col("q"))
    val varNum = col("q") * col("c") - col("s") * col("s")
    dense.join(broadcast(stats),
        col("event_type") === col("et3") && col("slot") === col("sl3"))
      .select(col("event_type"), col("h").as("hour_epoch"), col("slot"),
        col("n"),
        when(col("c") > 1 && varNum > 0,
          (col("n") * col("c") - col("s")).cast("double") /
            (col("c") * sqrt(varNum.cast("double") /
              (col("c") * (col("c") - 1)))))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  /** MAD (median-absolute-deviation) robust volume anomaly — the ROBUST
    * rung of the monitoring ladder (Hampel 1974's identifier; Leys et
    * al. 2013 argue it over z-scores): [[hourlyAnomaly]]'s mean/std are
    * themselves dragged by the outliers they are meant to flag (one
    * 100× spike inflates σ and masks every later spike — masking), while
    * the median and MAD have a 50% breakdown point. Robust z =
    * (n − median)/(1.4826·MAD), 1.4826 the consistency constant
    * (1/Φ⁻¹(3/4)) that makes MAD estimate σ under normality, so the
    * usual |z| > 3 / 3.5 cutoffs carry over.
    *
    * Exactness: medians via RANK ARITHMETIC over the zero-filled dense
    * hour spine — never percentile functions, whose interpolation
    * differs between engines. Doubled units keep half-integers exact:
    * `m2 = n@lo + n@hi` (lo = (c+1) div 2, hi = (c+2) div 2) is twice
    * the median, deviations `|2n − m2|` are exact longs, `mad4 = 2×`
    * their median is 4×MAD, and the ONE IEEE expression is
    * `2·(2n − m2)/(1.4826·mad4)`. Slots with MAD = 0 (over half the
    * hours share the median — typical for silent types) read NULL,
    * never ±Inf: a MAD-0 series needs the seasonal or CUSUM rung, not
    * a division by zero.
    *
    * Scale: the raw→hourly rollup is the only corpus-sized reduction;
    * the rank windows run per event_type over the SPINE (types × hours
    * — 8 760 rows per type-year), bounded state by construction.
    */
  def madAnomaly(events: DataFrame): DataFrame =
    madAnomalyFromHourly(events.groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("cnt")))

  /** [[madAnomaly]]'s finisher over a PRE-BUILT `(event_type, h, cnt)`
    * hourly cell frame — the same read-side contract as
    * [[seasonalAnomalyFromHourly]]: a streaming ingest maintains the
    * cells ([[graft.streaming.EventPipeline.hourlyCounts]]) and the
    * robust monitor reads off the live sink without re-scanning raw
    * events.
    */
  def madAnomalyFromHourly(hourly: DataFrame): DataFrame = {
    val spine = hourly.groupBy("event_type")
      .agg(min("h").as("mn"), max("h").as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), lit(3600L))).as("h"))
    val cells = hourly.select(col("event_type").as("et2"),
      col("h").as("h2"), col("cnt"))
    val dense = spine.join(cells,
        col("event_type") === col("et2") && col("h") === col("h2"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("cnt"), lit(0L)).as("n"))
    val byType = Window.partitionBy("event_type")
    def median2(df: DataFrame, valueCol: String, out: String): DataFrame =
      df.select(col("event_type"), col(valueCol),
          row_number().over(byType.orderBy(valueCol)).as("rk"),
          count(lit(1)).over(byType).as("c"))
        .groupBy("event_type")
        .agg((sum(when(col("rk") === expr("(c + 1) div 2"), col(valueCol))
            .otherwise(0L)) +
          sum(when(col("rk") === expr("(c + 2) div 2"), col(valueCol))
            .otherwise(0L))).as(out))
    val med = median2(dense, "n", "m2")
      .select(col("event_type").as("et3"), col("m2"))
    val dev = dense.join(broadcast(med), col("event_type") === col("et3"))
      .select(col("event_type"), col("h"), col("n"), col("m2"),
        abs(lit(2L) * col("n") - col("m2")).as("dv"))
    val madt = median2(dev, "dv", "mad4")
      .select(col("event_type").as("et4"), col("mad4"))
    dev.join(broadcast(madt), col("event_type") === col("et4"))
      .select(col("event_type"), col("h").as("hour_epoch"), col("n"),
        col("m2"), col("mad4"),
        when(col("mad4") > 0,
          lit(2.0) * (lit(2L) * col("n") - col("m2")).cast("double") /
            (lit(1.4826) * col("mad4")))
          .otherwise(lit(null).cast("double")).as("rz"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947; Wilcoxon 1945)
    * — the NONPARAMETRIC rung beside [[welchT]]: revenue-per-user
    * metrics are heavy-tailed enough that a handful of whales dominate
    * the t-test's variance; the rank test compares distributions with
    * no moment assumptions and is the standard robustness companion an
    * experimentation platform runs next to the t.
    *
    * Exactness: tied ranks are half-integers, so everything is carried
    * DOUBLED — per distinct metric value v with t(v) occurrences (ta of
    * them in arm 0) sitting above `below(v)` smaller units, twice the
    * tie-averaged rank sum of arm 0 is `r2a = Σ ta·(2(below+1)+(t−1))`,
    * twice the U statistic is `u2 = r2a − n0(n0+1)`, both exact longs.
    * The normal approximation with the standard tie correction
    * (Σ(t³−t)) is ONE fixed IEEE tree: `z = (u2 − n0·n1) /
    * (2·sqrt(n0·n1·((N³−N) − Σ(t³−t))/(12·N(N−1))))`, no continuity
    * correction (the large-sample form). `cles = u2/(2·n0·n1)` is the
    * common-language effect size (P(X₀ > X₁) + ½P(=)). Degenerate
    * designs (an empty arm, N ≤ 1, all values tied) read NULL.
    *
    * Longs hold while N³ < 2⁶³ — N ≤ ~2M units per experiment; beyond
    * that, pre-scale the tie term (monotone, no longer oracle-exact) —
    * the t12/32ah documentation convention.
    *
    * Scale shape: one corpus-sized rollup to (exp, value) cells, then
    * [[Corpus.prefixSumBy]] over (exp, value) for the below-counts —
    * the range-partitioned prefix machinery, never a one-task window —
    * with per-exp base offsets broadcast back; everything after is
    * per-exp rows.
    */
  def mannWhitney(units: DataFrame, expCol: String, variantCol: String,
      metricCol: String): DataFrame = {
    require(units.schema(metricCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$metricCol must be an integer-quantized LONG metric")
    val vals = units
      .select(col(expCol).as("exp"),
        col(variantCol).cast("long").as("variant"),
        col(metricCol).as("x"))
      .filter(col("variant").isin(0L, 1L))
      .groupBy("exp", "x")
      .agg(count(lit(1)).as("t"),
        sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("ta"))
    val pre = Corpus.prefixSumBy(vals, Seq("exp", "x"), "t", "__pre")
    val offs = pre.groupBy("exp").agg(min("__pre").as("__off"))
      .select(col("exp").as("e2"), col("__off"))
    val rk = pre.join(broadcast(offs), col("exp") === col("e2"))
      .withColumn("below", col("__pre") - col("__off"))
    val agg = rk.groupBy("exp")
      .agg(sum(col("ta") * (lit(2L) * (col("below") + 1L) +
          (col("t") - 1L))).as("r2a"),
        sum("ta").as("na"), sum(col("t") - col("ta")).as("nb"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
    val nn = col("na") + col("nb")
    val n3n = nn * nn * nn - nn
    agg
      .withColumn("u2a", col("r2a") - col("na") * (col("na") + 1L))
      .select(col("exp").as(expCol),
        col("na").as("n_0"), col("nb").as("n_1"),
        col("u2a").as("u2"), col("tie3"),
        when(col("na") > 0 && col("nb") > 0 && nn > 1 &&
          col("na") * col("nb") * (n3n - col("tie3")) > 0,
          (col("u2a") - col("na") * col("nb")).cast("double") /
            (lit(2.0) * sqrt(col("na").cast("double") * col("nb") *
              (n3n - col("tie3")) /
              (lit(12.0) * nn * (nn - 1)))))
          .otherwise(lit(null).cast("double")).as("z"),
        when(col("na") > 0 && col("nb") > 0,
          col("u2a") / (lit(2.0) * col("na") * col("nb")))
          .otherwise(lit(null).cast("double")).as("cles"))
  }

  def gapFillDaily(events: DataFrame): DataFrame = {
    // explicit user_id partitioning up front: every downstream stage's
    // required distribution is satisfied by it (see scaladoc), so no
    // stage after the branch exchanges ever re-shuffles
    val ev = events.select(col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("day"),
      unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      .repartition(col("user_id"))
    // dataframe aliases (not column renames — a rename would break the
    // partitioning reuse): grid and daily share the ev lineage, so a
    // same-name join condition would self-join-resolve trivially true
    val daily = ev.groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("us"), col("event_id"), col("event_type")))
          .getField("event_type").as("day_last"))
      .as("r")
    val grid = ev.groupBy("user_id")
      .agg(min("day").as("mn"), max("day").as("mx"))
      .select(col("user_id"), explode(sequence(col("mn"), col("mx"))).as("d"))
      .as("g")
    val ff = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, col("g.user_id") === col("r.user_id") &&
        col("g.d") === col("r.day"), "left")
      .select(col("g.user_id").as("user_id"), col("d"), col("n_events"),
        col("day_last"))
      .select(col("user_id"), col("d"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("day_last"), ignoreNulls = true).over(ff).as("last_type"),
        (col("d") - last(when(col("n_events").isNotNull, col("d")),
          ignoreNulls = true).over(ff)).as("days_since"))
  }

  /** Point-in-interval join by bucket decomposition — the SCALE path for
    * the q07 non-equi join class (IP→geo lookups, price-band tagging,
    * time-slot assignment): a plain `p BETWEEN lo AND hi` predicate has
    * no equi key, so Spark plans BroadcastNestedLoopJoin — O(N·M) work
    * and a broadcast that stops fitting long before 100 TB. Decomposing
    * each interval into the fixed-width buckets it covers turns the
    * predicate into an EQUI join on bucket id (+ the residual BETWEEN
    * filter inlined in the join), the standard interval-join rewrite
    * (e.g. Spark RangeJoin literature / Databricks range-join hints,
    * GeoSpark grid partitioning).
    *
    * Correctness is containment algebra, not sampling: a point lands in
    * exactly ONE bucket (`p div width`), every interval row is exploded
    * to ALL buckets it overlaps (`lo div width .. hi div width`), so a
    * qualifying (point, interval) pair meets on exactly one bucket id —
    * no misses, no duplicates. Work = N + M·(mean interval span /
    * width): `width` trades explode fan-out against per-bucket join
    * selectivity; pick it near the median interval span. Shuffles carry
    * fixed-width longs. Preconditions: integral `pCol`/`loCol`/`hiCol`
    * and lo ≤ hi rows (violators simply match nothing: an empty
    * `sequence(lo div w, hi div w)` explodes to no rows when reversed —
    * we filter them explicitly to keep the explode total).
    *
    * Returns the inner join: all `ranges` columns + all `points`
    * columns; aggregate/outer-extend in the caller.
    */
  /** Two-sided p-value of a test statistic under the standard normal —
    * the LARGE-SAMPLE approximation to the Welch-t reference distribution
    * (arms here hold hundreds of units, where t and z are
    * indistinguishable next to the erf-polynomial's own 1.5e-7 bound).
    * Abramowitz & Stegun 7.1.26: with x = |t|/√2 and s = 1/(1+0.3275911x),
    * `p = (a₁s + a₂s² + a₃s³ + a₄s⁴ + a₅s⁵)·e^(−x²)` — one fixed IEEE
    * expression tree. `exp` is the single non-correctly-rounded op in the
    * tree (Java Math.exp vs the oracle's libm may differ in the last
    * ulp), so the result is ROUNDED TO 7 DECIMALS — far above any ulp
    * divergence, far below any decision threshold (the §6
    * round-away-from-thresholds convention). NULL t yields NULL p.
    */
  def normalTwoSidedP(t: Column): Column = {
    val x = abs(t) * lit(7.071067811865476e-1)
    val s = lit(1.0) / (lit(1.0) + lit(3.275911e-1) * x)
    val poly = ((((lit(1.061405429e0) * s - lit(1.453152027e0)) * s +
      lit(1.421413741e0)) * s - lit(2.84496736e-1)) * s +
      lit(2.54829592e-1)) * s
    round(poly * exp(-(x * x)), 7)
  }

  /** Absorbing-Markov funnel attribution: for each event type, the
    * probability that a user chain starting there reaches `targetType`
    * within `steps` transitions, under the observed first-order
    * transition kernel ([[transitionMatrix]]'s counts with the target
    * made ABSORBING — its outgoing edges removed so mass that converts
    * stays converted). The number e09's ordered funnel cannot give:
    * e09 counts one fixed stage path; this scores EVERY state by its
    * eventual-conversion mass, the standard absorbing-chain read of
    * "which entry behaviors are worth acquiring".
    *
    * Exactness: the value iteration runs in INTEGER MICRO-UNITS —
    * `V₀(target) = 10⁹`, `V_{k+1}(s) = (Σ_next c(s,next)·V_k(next))
    * div t(s)` with TRUNCATING division — so every iterate is exact in
    * any engine (no float accumulates anywhere; each step's floor
    * costs < 1e-9 absolute). The reported p = V/10⁹ is one IEEE
    * division. Long headroom: Σ_next c·V ≤ t·10⁹, so states with up to
    * ~9×10⁹ outgoing transitions fit; beyond that, scale the unit
    * down or move the fold to DECIMAL(38,0).
    *
    * Shape: ONE distributed pass (the lag window + (prev, next)
    * rollup); the kernel is then event-type² rows — bounded by the
    * SCHEMA's type cardinality, not the corpus — pulled to the driver
    * and folded `steps` times (the kaplanMeier bounded-pull
    * convention). The oracle replays the fold as unrolled integer
    * CTEs, div-for-div.
    */
  def markovAbsorption(events: DataFrame, targetType: String,
      steps: Int): DataFrame = {
    require(steps >= 1 && steps <= 16, s"steps out of range: $steps")
    val Unit9 = 1000000000L
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // null-prev rows (each user's FIRST event) stay in the rollup:
    // every event is a next exactly once, so the rollup's next column
    // carries the complete state set — one pass serves transitions AND
    // states, no second corpus scan
    val rollup = events
      .select(col("event_type").as("next_type"),
        lag(col("event_type"), 1).over(byUser).as("prev_type"))
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2)))
    val states = rollup.map(_._2).distinct.sorted
    val trans = rollup.collect { case (Some(p), n, c) => (p, n, c) }
    val live = trans.filter(_._1 != targetType) // absorbing target
    val outTotal: Map[String, Long] =
      live.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    // enforce the documented headroom bound instead of wrapping
    // silently (r12 advice): Σ_next c·V ≤ t·Unit9 must fit a long, so
    // any state with t > Long.MaxValue/Unit9 (~9.2e9 outgoing
    // transitions) fails LOUDLY here — the centroidMigration dim-check
    // discipline. Past it, scale Unit9 down or move the fold to
    // DECIMAL(38,0).
    outTotal.foreach { case (s, t) =>
      require(t <= Long.MaxValue / Unit9,
        s"markovAbsorption: state '$s' has $t outgoing transitions — " +
          s"exceeds the long headroom bound ${Long.MaxValue / Unit9} " +
          "for the integer value iteration; reduce the unit or use a " +
          "decimal fold")
    }
    var v: Map[String, Long] =
      states.map(s => s -> (if (s == targetType) Unit9 else 0L)).toMap
    for (_ <- 1 to steps) {
      val next = states.map { s =>
        if (s == targetType) s -> Unit9
        else outTotal.get(s) match {
          case None | Some(0L) => s -> 0L
          case Some(t) =>
            val num = live.filter(_._1 == s)
              .map { case (_, to, c) => c * v(to) }.sum
            s -> num / t
        }
      }.toMap
      v = next
    }
    val spark = events.sparkSession
    import spark.implicits._
    states.map(s => (s, outTotal.getOrElse(s, 0L), v(s),
        v(s).toDouble / Unit9.toDouble)).toSeq
      .toDF("event_type", "n_out", "v_micro", "p_absorb")
  }

  /** One-way ANOVA F statistic (Fisher) per experiment — the MULTI-ARM
    * decision [[welchT]] cannot make: with k > 2 variants, k² pairwise
    * t-tests inflate false positives (the 32bf14 problem at the design
    * level); the omnibus F asks "does ANY arm differ" in one test.
    * `F = (SSB/(k−1)) / (SSW/(N−k))` with the computational forms
    * `SSB = Σₐ sₐ²/nₐ − S²/N`, `SSW = Q − Σₐ sₐ²/nₐ` over an
    * INTEGER-QUANTIZED metric (the welchT contract).
    *
    * Oracle exactness: per-arm (n, Σx, Σx²) are exact longs from ONE
    * fixed-width rollup. Each arm's sₐ²/nₐ is split EUCLIDEANLY —
    * integer quotient `(sₐ·sₐ) div nₐ` summed as exact longs, plus the
    * sub-1 remainder fraction `(sₐ² mod nₐ)/nₐ` injected to
    * DECIMAL(18,6) and decimal-summed (the e33 convention is only safe
    * at SMALL magnitude: casting a ~1e14 double to decimal records
    * digits below the double's own ulp, where Spark's shortest-repr
    * and a C engine's exact-expansion rounding diverge — r12b measured
    * exactly that; the sub-1 fraction keeps the cast far above ulp).
    * Everything after is one fixed IEEE expression both engines
    * replay. Long headroom: sₐ² < 2⁶³ (the welchT n·max(x)² bound one
    * power up — pre-scale the quantization beyond ~3e9-cent arm sums).
    * Degenerate cases (k < 2, N ≤ k, SSW ≤ 0) yield NULL F, never
    * ±Inf.
    *
    * Shape: ONE (experiment, variant) partial-agg rollup — the
    * exchange carries experiments × k rows — then an experiment-keyed
    * rollup over k-row groups. Nothing downstream scales with units.
    */
  def anovaF(units: DataFrame, expCol: String, variantCol: String,
      metricCol: String): DataFrame = {
    require(units.schema(metricCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$metricCol must be an integer-quantized LONG metric")
    val dec = DecimalType(18, 6)
    val arm = units
      .select(col(expCol).as("exp"), col(variantCol).as("variant"),
        col(metricCol).as("x"))
      .groupBy("exp", "variant")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("q"))
      .withColumn("__da", expr("(s * s) div n"))
      .withColumn("__fa",
        ((col("s") * col("s") % col("n")).cast("double") /
          col("n").cast("double")).cast(dec))
    arm.groupBy("exp")
      .agg(count(lit(1)).as("k_arms"), sum("n").as("n_units"),
        sum("s").as("__S"), sum("q").as("__Q"),
        sum("__da").as("__AI"), sum("__fa").as("__AF"))
      .withColumn("__a",
        col("__AI").cast("double") + col("__AF").cast("double"))
      // SSB >= 0 by Cauchy–Schwarz, but the subtraction of two nearly
      // equal ~1e16 doubles can cancel below their ulp and read
      // negative — clamp so no release card ever prints F < 0
      .withColumn("ssb",
        greatest(lit(0.0),
          col("__a") -
            col("__S").cast("double") * col("__S").cast("double") /
              col("n_units")))
      .withColumn("ssw",
        col("__Q").cast("double") - col("__a"))
      .withColumn("f_stat",
        when(col("k_arms") >= 2 && col("n_units") > col("k_arms") &&
          col("ssw") > 0,
          (col("ssb") / (col("k_arms") - 1)) /
            (col("ssw") / (col("n_units") - col("k_arms")))))
      .select(col("exp").as(expCol), col("k_arms"), col("n_units"),
        col("ssb"), col("ssw"), col("f_stat"))
  }

  /** Benjamini–Hochberg false-discovery-rate control (Benjamini &
    * Hochberg 1995) across a PORTFOLIO of tests — the multiple-testing
    * correction that belongs beside [[welchT]]/[[mannWhitneyU]] the
    * moment more than one experiment is read at once: at α=.05 a
    * 20-experiment dashboard flags one false positive per page by
    * construction; BH caps the EXPECTED FALSE-DISCOVERY FRACTION at α
    * instead. Input: one row per test with a p-value column. Output: the
    * input row plus `p_rank` (ascending p, key-tiebroken), `q_value` =
    * min_{j ≥ rank}(p₍ⱼ₎·m/j) clamped to 1 (the monotone step-up
    * adjustment), and `reject` (q ≤ α).
    *
    * Exactness: q is double arithmetic on the (already-rounded) p-values
    * — multiplication, division by exact small ints, running min — all
    * correctly-rounded IEEE ops any engine replays bit-for-bit. NULL
    * p-values (degenerate arms) are excluded from m and ranked last with
    * NULL q/reject.
    *
    * Scale: the two windows run over m rows — the number of EXPERIMENTS,
    * not units (bounded by construction: a portfolio is dozens of rows).
    * All per-unit work happened upstream in the welchT rollup.
    */
  def bhFdr(tests: DataFrame, keyCol: String, pCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val ranked = tests
      .withColumn("__m",
        count(when(col(pCol).isNotNull, 1)).over(
          Window.partitionBy(lit(1))))
      // NULLs last: a degenerate test neither gains nor blocks rank
      .withColumn("p_rank", row_number().over(
        Window.orderBy(col(pCol).isNull, col(pCol), col(keyCol))))
    val back = Window.orderBy(col("p_rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("__raw",
        col(pCol) * col("__m") / col("p_rank"))
      // explicit NULL guard: least() in both engines SKIPS nulls, so an
      // unguarded least(1.0, NULL) would read 1.0 for a degenerate test
      .withColumn("q_value",
        when(col(pCol).isNull, lit(null).cast("double"))
          .otherwise(least(lit(1.0), min(col("__raw")).over(back))))
      .withColumn("reject",
        when(col(pCol).isNull, lit(null).cast("boolean"))
          .otherwise(col("q_value") <= alpha))
      .drop("__m", "__raw")
  }

  def rangeBucketJoin(points: DataFrame, pCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // fail fast on shared column names (the rrfFuse lesson): the result
    // carries BOTH inputs' columns, and a silent duplicate would make
    // every downstream col() reference ambiguous at a distance
    val shared = points.columns.toSet.intersect(ranges.columns.toSet)
    require(shared.isEmpty,
      s"points and ranges share column names: ${shared.mkString(", ")}")
    val rb = ranges
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bkt", explode(sequence(
        expr(s"$loCol div ${bucketWidth}L"),
        expr(s"$hiCol div ${bucketWidth}L"))))
    val pb = points
      .withColumn("__bkt", expr(s"$pCol div ${bucketWidth}L"))
    rb.join(pb, Seq("__bkt"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bkt")
  }
}
