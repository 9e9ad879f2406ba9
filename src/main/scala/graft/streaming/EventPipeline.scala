package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming forms of the event-time operators. The column
  * expressions mirror graft.ops.Events exactly, so batch and streaming
  * agree; the streaming additions are the watermark (bounded state/late
  * data) and the session state machine.
  *
  * Scale shape: the windowed aggregate is a streaming partial aggregation —
  * state is (window, event_type) keyed, bounded by the watermark horizon;
  * sessionization state is one open session per user, keyed by user_id.
  */
object EventPipeline {

  /** Event-time in microseconds since the epoch, matching Spark's
    * `unix_micros` for ALL instants including pre-1970: `getTime` is
    * FLOOR-divided to whole seconds (plain `/` truncates toward zero,
    * which combined with the additive positive nanos fraction would map
    * 1969-12-31T23:59:59.5 to +500000 µs instead of −500000), then the
    * sub-second nanos re-add the microsecond fraction. Shared by every
    * stateful stream so batch↔stream closed-row parity cannot drift
    * per-operator.
    */
  private[streaming] def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class OpenSession(
      sessionIdx: Long,
      startMicros: Long,
      endMicros: Long,
      nEvents: Long,
      sumValue: Double)

  final case class Session(
      user_id: Long,
      session_idx: Long,
      n_events: Long,
      start_epoch: Long,
      end_epoch: Long,
      sum_value: Double)

  /** Streaming source over the events parquet layout (ns timestamps read
    * as longs, truncated to µs — same as Tables.events).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    // glob form: the source path is a single parquet FILE; a non-glob file
    // path makes the file-stream source use the file itself as the
    // partition-discovery base directory and reject it ("basePath must be
    // a directory"), while a glob resolves the base to the parent dir
    spark.readStream.schema(schema)
      .parquet(s"$dir/events.parque*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling 1-hour event-time window counts with a watermark: late rows
    * beyond `lateness` are dropped and window state is reclaimed — the
    * streaming analog of Events.hourlyAgg.
    */
  def hourlyCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Hopping (sliding) event-time windows with a watermark — the streaming
    * analog of the e07 batch query, same native `window(ts, size, hop)`
    * expression: Spark plans the size/hop-per-event Expand ahead of a
    * streaming partial aggregation, no self-join. State is keyed
    * (window, event_type) and reclaimed as the watermark passes each
    * window's end; a row holds size/hop concurrent windows at most.
    */
  def hoppingCounts(
      events: DataFrame,
      size: String = "1 hour",
      hop: String = "15 minutes",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size, hop), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming rolling active users — [[graft.ops.Events.rollingActive]]
    * as chained stateful aggregations (Spark 4 multiple-stateful-
    * operator support): each event lands in the `windowDays` SLIDING
    * windows that cover it (one Expand, the engine's window assignment —
    * the batch op's explode, event-side), the first aggregation
    * collapses to distinct (window, user) — the map-side reduction that
    * keeps user cardinality, not event volume, in state — and the
    * second counts users per window. A window labeled by its LAST day
    * emits once the watermark passes `window.end` (append mode), i.e.
    * day d's WAU finalizes `lateness` after day d closes.
    *
    * DAU is the `windowDays = 1` special case of the same shape — run a
    * second query over the same source (two cheap states) rather than
    * joining post-aggregation streams (stream-stream joins after
    * aggregations are not supported, and the batch join's role — drop
    * synthetic trailing days — is the consumer's filter here).
    *
    * State bound: (#live windows × active users/window) for the first
    * agg + (#live windows) for the second; both evict at the watermark.
    */
  def rollingActiveStream(
      events: DataFrame,
      windowDays: Int = 7,
      lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(
        window(col("ts"), s"$windowDays days", "1 day"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("active_users"))
      .select(
        // label = the window's last covered day (days since epoch),
        // matching the batch op's `d`
        ((unix_timestamp(col("window.end")) / 86400L).cast("long") - 1L)
          .as("d"),
        col("active_users"))

  final case class PropEvent(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String)

  /** Semi-structured payload extraction on a stream — the e08 batch shape
    * with a window for bounded append-mode state: `get_json_object` pulls
    * the typed field in the scan stage (one parse per row, no UDF) BEFORE
    * the watermark/aggregation, so the stateful operator only ever sees
    * (window, type) keys and four numeric aggregates.
    */
  def jsonPropStats(
      events: DataFrame,
      jsonPath: String = "$.k",
      lateness: String = "2 hours"): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), jsonPath).cast("long"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_with_k"), col("sum_k"),
        col("min_k"), col("max_k"))

  /** Stream-static enrichment join + windowed aggregation: events stream
    * joined to a STATIC dimension (user/customer attributes re-read from
    * storage per micro-batch, broadcast when small) before the stateful
    * aggregation. This is the standard "attach the dim, then aggregate"
    * ingest shape; the join is stateless — only the post-join windowed
    * aggregate holds state, keyed (window, dim attribute), reclaimed by
    * the watermark. Inner join semantics: stream rows without a dim match
    * drop (use left_outer + coalesce for keep-and-bucket-unknown).
    */
  def enrichedCounts(
      events: DataFrame,
      dim: DataFrame,
      dimKey: String,
      dimAttr: String,
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .join(broadcast(dim.select(col(dimKey).as("user_id"),
        col(dimAttr).as("dim_attr"))), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col("dim_attr"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("dim_attr"), col("n_events"))

  /** Watermarked stream-STREAM interval join: attribute each purchase to
    * the views by the same user in the preceding `horizon` — both sides
    * unbounded, so this is the stateful join (stream-static covers only a
    * fixed dim). State is bounded by construction: the interval condition
    * `v_ts ∈ [p_ts - horizon, p_ts]` plus both watermarks tells Spark
    * exactly when a buffered view can never match a future purchase and
    * is evicted — without the time bound the join would buffer both
    * streams forever. Inner join in append mode: a row emits once both
    * sides' watermarks pass its window.
    */
  def attributionJoin(
      views: DataFrame,
      purchases: DataFrame,
      horizon: String = "1 hour",
      lateness: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    val v = views
      .withWatermark("ts", lateness)
      .select(col("user_id"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = purchases
      .withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    // leftOuter: an unmatched view emits null-extended ONCE its watermark
    // window closes (Spark proves no future purchase can still match) —
    // the "views that never converted" stream, impossible to get from the
    // inner join without a second batch pass
    v.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        unix_timestamp(col("v_ts")).as("view_epoch"),
        unix_timestamp(col("p_ts")).as("purchase_epoch"))
  }

  /** Streaming exact deduplication on a key column — the ingest-time
    * analog of Dedup.exact for an unbounded source (at-least-once
    * upstreams re-deliver events; this makes the pipeline effectively
    * exactly-once downstream). State holds one entry per key seen within
    * the watermark horizon and is evicted as the watermark advances —
    * bounded state, unlike `dropDuplicates` which remembers every key
    * forever. Rows later than `lateness` are dropped by the watermark
    * (their duplicates-of-record may already be evicted — the standard
    * correctness/state trade governed by the horizon).
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gap sessionization via Spark's NATIVE `session_window` aggregation —
    * the declarative twin of [[sessionize]]: the engine owns the session
    * state (merge-on-arrival, watermark-driven emission in append mode),
    * so there is no custom state machine to maintain, and the planner can
    * apply its streaming-aggregation optimizations. Emits one row per
    * CLOSED session: (user_id, n_events, start_epoch, end_epoch,
    * sum_value), where end_epoch is the LAST EVENT's time — Spark defines
    * the session window's end as last-event + gap, so the gap is
    * subtracted back out to match [[sessionize]]/Events.sessionize.
    *
    * What the custom machine still buys over this (why both exist):
    * cumulative per-user session NUMBERING across sessions (session_idx —
    * aggregation output can't see previous windows), tombstone-TTL state
    * control, and emit-on-next-event without a watermark. Use this one
    * when those aren't needed: less code, engine-owned state. Parity on
    * the shared columns is spec-asserted (StreamingSpec).
    */
  def sessionizeNative(
      events: DataFrame,
      gapSeconds: Long,
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(col("user_id"), col("n_events"),
        unix_timestamp(col("session_window.start")).as("start_epoch"),
        (unix_timestamp(col("session_window.end")) - gapSeconds).as("end_epoch"),
        col("sum_value"))

  /** Per-user recent-history state for [[sequenceStream]]: total events
    * seen and the newest `maxLen` (micros, event_id, event_type) triples
    * sorted ascending — a fixed-size ring, never the full history.
    */
  final case class SeqState(nEvents: Long, items: List[(Long, Long, String)])

  /** One emitted training sequence (the streaming row shape of
    * [[graft.ops.Events.userSequences]]).
    */
  final case class UserSeq(user_id: Long, n_events: Long, seq: String)

  /** Streaming twin of [[graft.ops.Events.userSequences]]: maintains each
    * user's newest `maxLen` events and EMITS the serialized sequence when
    * the user goes idle for `idleSeconds` (event-time timeout) — online
    * training-example generation: an example becomes final exactly when
    * the history it serializes provably can't grow (same closure rule as
    * session emission). Requires `withWatermark` upstream.
    *
    * State per user is BOUNDED: `maxLen` fixed-width triples plus a
    * count — the streaming mirror of the batch operator's
    * truncate-before-collect argument, and it drops to zero at emit
    * (state.remove; a returning user starts a fresh sequence, the
    * streaming analog of one example per idle-delimited episode).
    * Batch parity on a closed episode is spec-asserted: merge-sort by
    * (µs, event_id) then keep-newest equals the batch window's
    * row_number truncation.
    */
  /** Per-type state for [[anomalyStream]]: open per-hour counts (bounded
    * by the stream's out-of-orderness — hours still accumulating) plus
    * exact integer moments (c, Σ, Σ²) of every CLOSED hour.
    */
  final case class AnomState(open: Map[Long, Long], c: Long, s: Long, q: Long)

  /** One scored closed hour ([[anomalyStream]] output): the hour's count,
    * how many closed hours the baseline held when it was scored, and the
    * z-score (None until the baseline has ≥ 2 hours with variance).
    */
  final case class HourAnomaly(event_type: String, hour_epoch: Long,
      n: Long, n_baseline: Long, z: Option[Double])

  /** ONLINE hourly anomaly monitor — the streaming twin of
    * [[graft.ops.Events.hourlyAnomaly]] with the one honest causal
    * change: batch scores every hour against the FULL series' moments
    * (retrospective audit); a live monitor can only score an hour
    * against hours already closed, so each hour's z uses the exact
    * integer moments (c, Σ, Σ²) of strictly EARLIER closed hours — the
    * same guarded formula, NULL until the baseline has two hours and
    * variance. An hour CLOSES when a later hour arrives for its type
    * (the same-next-bucket closure rule a dashboard applies; pair with
    * an upstream watermark so stragglers for closed hours are dropped
    * rather than silently lost). Counts accumulate ACROSS micro-batches
    * while an hour is open — the cross-batch fold a naive per-batch
    * monitor gets wrong (StreamingSpec pins it).
    *
    * State per type is BOUNDED: the open-hours map (out-of-orderness
    * wide, typically 1–2 entries) + three longs — no history of closed
    * hours is ever kept, because the z only needs the moments.
    */
  def anomalyStream(events: Dataset[Event]): Dataset[HourAnomaly] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomState, HourAnomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ: String, it: Iterator[Event], state: GroupState[AnomState]) =>
          val st0 = state.getOption.getOrElse(AnomState(Map.empty, 0L, 0L, 0L))
          var open = st0.open
          it.foreach { e =>
            val h = micros(e.ts) / 1000000L / 3600L * 3600L
            open = open.updated(h, open.getOrElse(h, 0L) + 1L)
          }
          if (open.isEmpty) Iterator.empty
          else {
            val maxH = open.keys.max
            val (closing, stillOpen) = open.partition(_._1 < maxH)
            var c = st0.c; var s = st0.s; var q = st0.q
            val out = closing.toSeq.sortBy(_._1).map { case (h, n) =>
              val varNum = q * c - s * s
              val z = if (c > 1 && varNum > 0)
                Some((n * c - s).toDouble /
                  (c * math.sqrt(varNum.toDouble / (c * (c - 1)))))
              else None
              val baseline = c
              c += 1; s += n; q += n * n
              HourAnomaly(typ, h, n, baseline, z)
            }
            state.update(AnomState(stillOpen, c, s, q))
            out.iterator
          }
      }
  }

  def sequenceStream(
      events: Dataset[Event],
      maxLen: Int,
      idleSeconds: Long): Dataset[UserSeq] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, UserSeq](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              UserSeq(userId, s.nEvents, s.items.map(_._3).mkString(",")))
            state.remove()
            out.iterator
          } else {
            val batch = it.toArray
            if (batch.isEmpty) Iterator.empty
            else {
              val prev = state.getOption.getOrElse(SeqState(0L, Nil))
              val merged = (prev.items ++
                batch.map(e => (micros(e.ts), e.event_id, e.event_type)))
                .sortBy(x => (x._1, x._2))
                .takeRight(maxLen)
              state.update(SeqState(prev.nEvents + batch.length, merged))
              state.setTimeoutTimestamp(math.max(
                merged.last._1 / 1000L + idleSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
              Iterator.empty
            }
          }
      }
  }

  final case class GapState(lastUs: Long, lastId: Long)
  final case class EventGap(event_type: String, event_id: Long, gap_us: Long)

  /** Stateful per-user inter-event gaps — the streaming twin of
    * [[graft.ops.Events.interEventGaps]]'s lag-window stage. State is
    * ONE (ts, id) pair per user (the same O(active users) bound as
    * sessionization); each arriving event emits its gap to the user's
    * previous event, keyed by the later event's type. Within a
    * micro-batch the group sorts by (ts, event_id) — the batch lag
    * order; across batches arrival must respect event time per user
    * (the sequenceStream convention; a watermark-reordering variant
    * would buffer like sessionize's flush path). The percentile rollup
    * stays a separate aggregation: exact per type in foreachBatch at
    * low cardinality, or `approx_percentile`'s mergeable t-digest as a
    * standing streaming agg.
    */
  def gapStream(events: Dataset[Event]): Dataset[EventGap] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, EventGap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[GapState]) =>
          val batch = it.toArray
            .map(e => (micros(e.ts), e.event_id, e.event_type))
            .sortBy(x => (x._1, x._2))
          if (batch.isEmpty) Iterator.empty
          else {
            var last = state.getOption
            val out = batch.flatMap { case (us, id, tp) =>
              val g = last.map(l => EventGap(tp, id, us - l.lastUs))
              last = Some(GapState(us, id))
              g
            }
            state.update(last.get)
            out.iterator
          }
      }
  }

  final case class TransState(lastUs: Long, lastId: Long, lastType: String)
  final case class Transition(
      prev_type: String, next_type: String, event_id: Long)

  /** Stateful per-user event transitions — the streaming twin of
    * [[graft.ops.Events.transitionMatrix]]'s lag stage, with
    * [[gapStream]]'s exact state shape extended by the previous event's
    * TYPE: one (ts, id, type) triple per user, each arrival emitting its
    * (prev → next) pair. The matrix rollup (counts + P(next|prev)) is a
    * tiny type²-cardinality aggregation downstream — exact in
    * foreachBatch, or a standing streaming agg in Update mode. Same
    * arrival contract as gapStream: event-time ordered per user across
    * micro-batches.
    */
  def transitionStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[TransState]) =>
          val batch = it.toArray
            .map(e => (micros(e.ts), e.event_id, e.event_type))
            .sortBy(x => (x._1, x._2))
          if (batch.isEmpty) Iterator.empty
          else {
            var last = state.getOption
            val out = batch.flatMap { case (us, id, tp) =>
              val t = last.map(l => Transition(l.lastType, tp, id))
              last = Some(TransState(us, id, tp))
              t
            }
            state.update(last.get)
            out.iterator
          }
      }
  }

  final case class ScdState(
      sinceUs: Long, lastUs: Long, lastId: Long, lastType: String)
  final case class ScdRow(
      user_id: Long, event_type: String,
      valid_from_us: Long, valid_to_us: Long)

  /** Streaming twin of [[graft.ops.Events.scd2History]] for the CLOSED
    * intervals: state = one (run-start, last-seen, type) triple per
    * user; an arrival with a DIFFERENT type closes the standing run and
    * emits it with `[run-start, change-ts)` bounds — exactly the batch
    * row. The OPEN current run IS the state (batch reports it as the
    * `is_current` row; a stream cannot emit it in Append mode until it
    * closes — spec asserts closed-row parity and that the state holds
    * the batch's current rows). Same arrival contract as
    * [[transitionStream]]: event-time ordered per user across
    * micro-batches; within a batch, arrivals sort on (ts, event_id).
    */
  def scd2Stream(events: Dataset[Event]): Dataset[ScdRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdState, ScdRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[ScdState]) =>
          val batch = it.toArray
            .map(e => (micros(e.ts), e.event_id, e.event_type))
            .sortBy(x => (x._1, x._2))
          if (batch.isEmpty) Iterator.empty
          else {
            var st = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[ScdRow]
            batch.foreach { case (us, id, tp) =>
              st match {
                case Some(s) if s.lastType == tp =>
                  st = Some(s.copy(lastUs = us, lastId = id))
                case Some(s) =>
                  out += ScdRow(uid, s.lastType, s.sinceUs, us)
                  st = Some(ScdState(us, us, id, tp))
                case None =>
                  st = Some(ScdState(us, us, id, tp))
              }
            }
            state.update(st.get)
            out.iterator
          }
      }
  }

  /** Stateful gap sessionization: one open session per user in the state
    * store; a session is emitted when the user's next event arrives more
    * than `gapSeconds` after it ended — or, with `flushOnWatermark`, when
    * the event-time watermark passes the session's gap horizon (so idle
    * users' sessions emit without waiting for their next event; requires
    * `withWatermark` upstream).
    *
    * `tombstoneTtlSeconds` bounds state at scale: after a watermark flush,
    * the per-user numbering tombstone (see below) itself expires once the
    * user has been idle longer than gap + TTL. An expired user who returns
    * restarts at session_idx 1 — the deliberate trade for state that is
    * O(recently-active users) instead of O(ever-seen users). None (the
    * default) keeps tombstones forever, preserving exact batch numbering.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long,
      flushOnWatermark: Boolean = false,
      tombstoneTtlSeconds: Option[Long] = None): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L

    // exact µs: getTime truncates to ms, getNanos carries the full fraction
    def toSession(userId: Long, s: OpenSession): Session =
      Session(userId, s.sessionIdx, s.nEvents,
        s.startMicros / 1000000L, s.endMicros / 1000000L, s.sumValue)

    val timeout =
      if (flushOnWatermark) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](OutputMode.Append, timeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // Watermark passed end + gap with no new events: close it, but
            // KEEP a tombstone (nEvents == 0) carrying the last emitted
            // session_idx so the user's next session continues the
            // cumulative numbering (batch/streaming equivalence). With a
            // TTL, the tombstone gets its own timeout and is dropped when
            // it fires (the `case _` below) — bounding state to recently-
            // active users at the cost of numbering resets after long
            // idles; without one it is a tiny record per ever-seen user.
            val out = state.getOption.filter(_.nEvents > 0)
              .map(toSession(userId, _))
            state.getOption match {
              case Some(s) if s.nEvents > 0 =>
                state.update(OpenSession(s.sessionIdx, s.endMicros,
                  s.endMicros, 0L, 0.0))
                tombstoneTtlSeconds.foreach { ttl =>
                  // clamp: Spark rejects timestamps behind the watermark;
                  // an already-due expiry fires on the next trigger
                  state.setTimeoutTimestamp(math.max(
                    s.endMicros / 1000L + (gapSeconds + ttl) * 1000L,
                    state.getCurrentWatermarkMs() + 1L))
                }
              case _ => state.remove()
            }
            out.iterator
          } else {
            // events within a micro-batch are not ordered: sort this batch
            val batch = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open = state.getOption
            batch.foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if s.nEvents == 0 =>
                  // tombstone from a watermark flush: resume numbering
                  open = Some(OpenSession(s.sessionIdx + 1, t, t, 1L, e.value))
                case Some(s) if t - s.endMicros <= gapMicros =>
                  open = Some(s.copy(endMicros = t, nEvents = s.nEvents + 1,
                    sumValue = s.sumValue + e.value))
                case Some(s) =>
                  closed += toSession(userId, s)
                  open = Some(OpenSession(s.sessionIdx + 1, t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(1L, t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              if (flushOnWatermark && s.nEvents > 0)
                state.setTimeoutTimestamp(math.max(
                  s.endMicros / 1000L + gapSeconds * 1000L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator
          }
      }
  }

  /** Streaming maintenance of [[graft.ops.Events.welchT]]'s UNIT-METRIC
    * state — the continuous experiment monitor: per-unit metric totals
    * are commutative long sums, so a plain streaming aggregation keyed
    * by (experiment, unit, variant) IS the batch rollup (the t39
    * histBinStream argument applied to experiments), and update-mode
    * emissions re-publish only units a micro-batch touched. The arm
    * rollup and the t/df IEEE chain CANNOT fold incrementally (Σx² must
    * square FINAL unit totals, not per-batch deltas), so they finish
    * read-side: run `Events.welchT` over the sink — a units-sized
    * frame, never the event stream. `metricCol` must already be the
    * integer-quantized per-event metric (cents), welchT's contract.
    *
    * State = one long per live (experiment, unit) — the streaming
    * exact-dedup seen-set class (32h): bounded by units, not events.
    * EventStreamSpec asserts streamed unit cells ≡ the batch rollup and
    * the finished t/df ≡ batch welchT across micro-batches.
    */
  def unitMetricStream(events: DataFrame, expCol: String,
      unitCol: String, variantCol: String, metricCol: String): DataFrame =
    events
      .groupBy(col(expCol), col(unitCol), col(variantCol))
      .agg(sum(col(metricCol)).as("metric"))
}
