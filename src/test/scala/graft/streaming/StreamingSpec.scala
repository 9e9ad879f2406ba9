package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import EventPipeline.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, sec: Long, user: Long, typ: String, v: Double) =
    Event(id, new Timestamp(sec * 1000L), user, typ, v)

  test("hourlyCounts: windowed event-time aggregation over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventPipeline.hourlyCounts(src.toDF(), lateness = "1 hour")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update).start()
    try {
      src.addData(ev(0, 10, 1, "click", 1.0), ev(1, 600, 1, "click", 2.0),
        ev(2, 3700, 2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains((0L, "click", 2L, 3.0)))
      assert(rows.contains((3600L, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("anomalyStream: hours close on the next hour's arrival, counts " +
    "accumulate across micro-batches, z scores against PRIOR closed " +
    "moments only (guarded), the open hour never emits") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventPipeline.anomalyStream(src.toDS())
      .writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append).start()
    try {
      def hr(h: Long, k: Int, base: Long): Seq[Event] =
        (0 until k).map(i => ev(h * 100 + i, h * 3600 + base + i, 1L, "a", 0.0))
      // hour counts: h0=2, h1=3, h2=2, h3=3, then a spike h4=8
      // batch 1: all of h0 + ONE h1 event -> closes h0 (baseline 0)
      src.addData(hr(0, 2, 0) ++ hr(1, 1, 0): _*)
      q.processAllAvailable()
      // batch 2: h1's remaining TWO events + h2 -> closes h1 at the
      // ACCUMULATED count 3 (the cross-batch fold)
      src.addData(hr(1, 2, 10) ++ hr(2, 2, 0): _*)
      q.processAllAvailable()
      // batch 3: h3 -> closes h2; batch 4: h4 spike -> closes h3;
      // batch 5: one h5 event -> closes h4 against baseline {2,3,2,3}
      src.addData(hr(3, 3, 0): _*); q.processAllAvailable()
      src.addData(hr(4, 8, 0): _*); q.processAllAvailable()
      src.addData(hr(5, 1, 0): _*); q.processAllAvailable()
      val rows = spark.table("anom").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
        .sortBy(_._1)
      assert(rows.map(x => (x._1 / 3600, x._2)).toSeq ==
        Seq((0L, 2L), (1L, 3L), (2L, 2L), (3L, 3L), (4L, 8L)),
        s"closed hours/counts: ${rows.toSeq}")
      assert(rows.map(_._3).toSeq == Seq(0L, 1L, 2L, 3L, 4L),
        "baseline grows by one closed hour each time")
      // guards: baselines of size < 2 -> None; {2,3} and {2,3,2} have
      // variance, so h2 and h3 DO score; the spike's z vs {2,3,2,3}:
      // (8*4-10)/(4*sqrt((26*4-100)/(4*3))) = 22/(4*sqrt(1/3)) = 9.5263
      assert(rows(0)._4.isEmpty && rows(1)._4.isEmpty)
      assert(rows(2)._4.isDefined && rows(3)._4.isDefined)
      val zSpike = rows(4)._4.get
      assert(math.abs(zSpike - 22.0 / (4.0 * math.sqrt(1.0 / 3.0))) < 1e-9,
        s"spike z: $zSpike")
      assert(!rows.map(_._1 / 3600).contains(5L), "open hour must not emit")
    } finally q.stop()
  }

  test("hourlyCounts: watermark drops too-late rows") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventPipeline.hourlyCounts(src.toDF(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("hourly_wm")
      .outputMode(OutputMode.Update).start()
    try {
      src.addData(ev(0, 7200, 1, "click", 1.0)) // watermark -> 7200-600
      q.processAllAvailable()
      src.addData(ev(1, 10, 1, "click", 1.0)) // hour-0 window closed: dropped
      q.processAllAvailable()
      val rows = spark.table("hourly_wm").collect().map(_.getLong(0))
      assert(!rows.contains(0L))
    } finally q.stop()
  }

  test("seasonal monitor reads off the streamed hourly cells: the e29 " +
    "finisher over the live sink equals batch seasonalAnomaly, with an " +
    "hour accumulating ACROSS micro-batches") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L
    // 3 days, one type: slot 0 constant (2/day), slot 1 bursts on day 2;
    // day-2 slot-1 gets one event in batch 1 and two MORE in batch 2 —
    // the cross-batch accumulation a naive per-batch monitor gets wrong
    val evs = Seq(
      ev(0, 0, 1, "a", 1.0), ev(1, 10, 1, "a", 1.0),
      ev(2, day, 1, "a", 1.0), ev(3, day + 10, 1, "a", 1.0),
      ev(4, 2 * day, 1, "a", 1.0), ev(5, 2 * day + 10, 1, "a", 1.0),
      ev(6, 3600, 1, "a", 1.0), ev(7, day + 3600, 1, "a", 1.0),
      ev(8, 2 * day + 3600, 1, "a", 1.0),
      ev(9, 2 * day + 3610, 1, "a", 1.0), ev(10, 2 * day + 3620, 1, "a", 1.0))
    val src = MemoryStream[Event]
    val q = EventPipeline.hourlyCounts(src.toDF(), lateness = "1 hour")
      .writeStream.format("memory").queryName("seasonal_cells")
      .outputMode(OutputMode.Complete).start()
    try {
      src.addData(evs.take(9): _*)
      q.processAllAvailable()
      src.addData(evs.drop(9): _*) // tops up an already-emitted hour cell
      q.processAllAvailable()
      val cells = spark.table("seasonal_cells")
        .select(col("event_type"), col("hour_epoch").as("h"),
          col("n_events").as("cnt"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
      val streamed = rows(graft.ops.Events.seasonalAnomalyFromHourly(cells))
      val batch = rows(graft.ops.Events.seasonalAnomaly(
        evs.toDF().select(col("ts"), col("event_type"))))
      assert(streamed == batch && streamed.size == 50)
      // the burst hour carries the cross-batch count of 3
      assert(streamed.exists(x => x._2 == 2 * day + 3600L && x._4 == 3L))
    } finally q.stop()
  }

  test("MAD robust monitor reads off the streamed hourly cells: the e30 " +
    "finisher over the live sink equals batch madAnomaly across batches") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // same fixture shape as the seasonal parity case: a burst hour
    // accumulating ACROSS micro-batches
    val day = 86400L
    val evs = Seq(
      ev(0, 0, 1, "a", 1.0), ev(1, 10, 1, "a", 1.0),
      ev(2, day, 1, "a", 1.0), ev(3, day + 10, 1, "a", 1.0),
      ev(4, 2 * day, 1, "a", 1.0), ev(5, 2 * day + 10, 1, "a", 1.0),
      ev(6, 3600, 1, "a", 1.0), ev(7, day + 3600, 1, "a", 1.0),
      ev(8, 2 * day + 3600, 1, "a", 1.0),
      ev(9, 2 * day + 3610, 1, "a", 1.0), ev(10, 2 * day + 3620, 1, "a", 1.0))
    val src = MemoryStream[Event]
    val q = EventPipeline.hourlyCounts(src.toDF(), lateness = "1 hour")
      .writeStream.format("memory").queryName("mad_cells")
      .outputMode(OutputMode.Complete).start()
    try {
      src.addData(evs.take(9): _*)
      q.processAllAvailable()
      src.addData(evs.drop(9): _*)
      q.processAllAvailable()
      val cells = spark.table("mad_cells")
        .select(col("event_type"), col("hour_epoch").as("h"),
          col("n_events").as("cnt"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSet
      val streamed = rows(graft.ops.Events.madAnomalyFromHourly(cells))
      val batch = rows(graft.ops.Events.madAnomaly(
        evs.toDF().select(col("ts"), col("event_type"))))
      assert(streamed == batch && streamed.size == 50)
      // the burst hour carries the cross-batch count of 3
      assert(streamed.exists(x => x._2 == 2 * day + 3600L && x._3 == 3L))
    } finally q.stop()
  }

  test("rollingActiveStream: chained stateful aggs equal the batch " +
    "DAU/WAU once windows close") {
    implicit val sqlCtx = spark.sqlContext
    val day = 86400L
    // users over four days: u1 daily, u2 every other day, u3 once
    val all = Seq(
      ev(0, 0 * day + 100, 1, "c", 0.0), ev(1, 0 * day + 200, 2, "c", 0.0),
      ev(2, 1 * day + 100, 1, "c", 0.0), ev(3, 1 * day + 100, 3, "c", 0.0),
      ev(4, 2 * day + 100, 1, "c", 0.0), ev(5, 2 * day + 100, 2, "c", 0.0),
      ev(6, 3 * day + 100, 1, "c", 0.0))
    val batch = graft.ops.Events.rollingActive(all.toDF(), windowDays = 2)
      .collect()
      .map(r => r.getInt(0).toLong -> ((r.getLong(1), r.getLong(2))))
      .toMap
    def run(windowDays: Int, name: String): Map[Long, Long] = {
      val src = MemoryStream[Event]
      val q = EventPipeline.rollingActiveStream(
          src.toDF(), windowDays, lateness = "1 hour")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        src.addData(all.take(4): _*)
        q.processAllAvailable()
        src.addData(all.drop(4): _*)
        q.processAllAvailable()
        // flush: push the watermark far past every window's end
        src.addData(ev(99, 30 * day, 9, "c", 0.0))
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally q.stop()
    }
      // WAU twin: the stream also labels synthetic trailing days (the
      // batch joins them away); compare on the batch's days
    val wau = run(2, "wau_stream")
    assert(batch.keySet.subsetOf(wau.keySet))
    batch.foreach { case (d, (_, w)) => assert(wau(d) == w, s"day $d") }
    // DAU is the windowDays=1 special case of the same operator
    val dau = run(1, "dau_stream")
    batch.foreach { case (d, (x, _)) => assert(dau(d) == x, s"day $d") }
  }

  test("cadenceFlags runs unchanged as an Update-mode streaming agg") {
    // the batch operator is algebraic (count/min/max are commutative
    // monoids), so Spark's native incremental aggregation IS its
    // streaming twin — no custom state machine. Feed the same events in
    // two batches; the final Update rows must equal the batch result.
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val all = (0 until 40).map(i => ev(i, i, 1, "c", 0.0)) ++
      (0 until 40).map(i => ev(100 + i, i * 3600L, 2, "c", 0.0))
    val q = graft.ops.Events.cadenceFlags(src.toDF(),
        minEvents = 30, maxMeanGapSec = 2L)
      .writeStream.format("memory").queryName("cadence")
      .outputMode(OutputMode.Update).start()
    try {
      src.addData(all.take(25): _*)
      q.processAllAvailable()
      src.addData(all.drop(25): _*)
      q.processAllAvailable()
      val stream = spark.table("cadence").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4)))
        .groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSet
      val batch = graft.ops.Events.cadenceFlags(
          all.toDF(), minEvents = 30, maxMeanGapSec = 2L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      assert(stream == batch)
      assert(batch.exists(r => r._1 == 1L && r._5) &&
        batch.exists(r => r._1 == 2L && !r._5))
    } finally q.stop()
  }

  test("sessionize: emits a session when the gap is exceeded across batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventPipeline.sessionize(src.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(ev(0, 0, 1, "click", 1.0), ev(1, 60, 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // session still open
      src.addData(ev(2, 4000, 1, "view", 3.0)) // gap > 1800s -> closes s1
      q.processAllAvailable()
      val s = spark.table("sessions").as[EventPipeline.Session].collect()
      assert(s.toSeq == Seq(
        EventPipeline.Session(1L, 1L, 2L, 0L, 60L, 3.0)))
      // user 2 in its own state partition, unaffected
      src.addData(ev(3, 10, 2, "click", 9.0), ev(4, 8000, 2, "click", 1.0))
      q.processAllAvailable()
      val s2 = spark.table("sessions").as[EventPipeline.Session].collect()
      assert(s2.exists(x => x.user_id == 2L && x.n_events == 1L))
    } finally q.stop()
  }

  test("sessionize flushOnWatermark: idle session closes without new user events") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventPipeline.sessionize(
        src.toDS().withWatermark("ts", "10 seconds"),
        gapSeconds = 1800L, flushOnWatermark = true)
      .writeStream.format("memory").queryName("sessions_wm")
      .outputMode(OutputMode.Append).start()
    try {
      // NOTE: events exactly AT the watermark are dropped by the stateful
      // late filter, and the initial watermark is epoch 0 — so test times
      // start above it
      src.addData(ev(0, 100, 1, "click", 1.0), ev(1, 160, 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_wm").count() == 0) // open, watermark 150
      // another USER's event drives the watermark past 160 + 1800
      src.addData(ev(2, 10000, 2, "view", 5.0))
      q.processAllAvailable()
      // timeout fires on the trigger after the watermark advances
      src.addData(ev(3, 10001, 2, "view", 1.0))
      q.processAllAvailable()
      val s = spark.table("sessions_wm").as[EventPipeline.Session].collect()
      assert(s.exists(x => x.user_id == 1L && x.n_events == 2L &&
        x.start_epoch == 100L && x.end_epoch == 160L && x.sum_value == 3.0))
    } finally q.stop()
  }

  test("sessionize flushOnWatermark: session_idx continues after a timeout flush") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventPipeline.sessionize(
        src.toDS().withWatermark("ts", "10 seconds"),
        gapSeconds = 1800L, flushOnWatermark = true)
      .writeStream.format("memory").queryName("sessions_idx")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(ev(0, 100, 1, "click", 1.0))
      q.processAllAvailable()
      // drive the watermark past 100 + 1800 via another user, then trigger
      src.addData(ev(1, 10000, 2, "view", 5.0))
      q.processAllAvailable()
      src.addData(ev(2, 10001, 2, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions_idx").as[EventPipeline.Session].collect()
        .exists(x => x.user_id == 1L && x.session_idx == 1L))
      // user 1 returns: the new session must continue cumulative numbering
      // (idx 2), not restart at 1 — matches the batch operator's numbering
      src.addData(ev(3, 12000, 1, "click", 7.0))
      q.processAllAvailable()
      src.addData(ev(4, 20000, 2, "view", 1.0)) // watermark past 12000+1800
      q.processAllAvailable()
      src.addData(ev(5, 20001, 2, "view", 1.0)) // trigger the timeout
      q.processAllAvailable()
      val u1 = spark.table("sessions_idx").as[EventPipeline.Session].collect()
        .filter(_.user_id == 1L).map(_.session_idx).sorted
      assert(u1.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("tombstone TTL: numbering survives sub-TTL idles, resets after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    // gap 1800s, tombstone TTL 1000s -> tombstone expires once the user is
    // idle past 2800s (gap + ttl)
    val q = EventPipeline.sessionize(
        src.toDS().withWatermark("ts", "10 seconds"),
        gapSeconds = 1800L, flushOnWatermark = true,
        tombstoneTtlSeconds = Some(1000L))
      .writeStream.format("memory").queryName("sessions_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      // --- sub-TTL idle: numbering continues ---
      src.addData(ev(0, 100, 1, "click", 1.0))
      q.processAllAvailable()
      // u2 drives watermark to 1990 (> 100+1800): u1 flushes, tombstone
      // timeout armed for 100+1800+1000 = 2900
      src.addData(ev(1, 2000, 2, "view", 5.0))
      q.processAllAvailable()
      src.addData(ev(2, 2001, 2, "view", 1.0)) // trigger the timeout
      q.processAllAvailable()
      assert(spark.table("sessions_ttl").as[EventPipeline.Session].collect()
        .exists(x => x.user_id == 1L && x.session_idx == 1L))
      // u1 returns at 2500 — watermark (1991) still below 2900, tombstone
      // alive -> session_idx continues at 2
      src.addData(ev(3, 2500, 1, "click", 7.0))
      q.processAllAvailable()
      src.addData(ev(4, 10000, 2, "view", 1.0)) // watermark past 2500+1800
      q.processAllAvailable()
      src.addData(ev(5, 10001, 2, "view", 1.0)) // trigger
      q.processAllAvailable()
      val afterReturn = spark.table("sessions_ttl")
        .as[EventPipeline.Session].collect().filter(_.user_id == 1L)
      assert(afterReturn.map(_.session_idx).sorted.toSeq == Seq(1L, 2L))
      // --- past-TTL idle: tombstone expired, numbering resets ---
      // idx-2 tombstone timeout armed for 2500+2800 = 5300; watermark is
      // already 9990, so the next trigger removes it
      src.addData(ev(6, 10002, 2, "view", 1.0)) // trigger tombstone expiry
      q.processAllAvailable()
      src.addData(ev(7, 20000, 1, "click", 3.0)) // u1 returns after expiry
      q.processAllAvailable()
      src.addData(ev(8, 30000, 2, "view", 1.0)) // watermark past 20000+1800
      q.processAllAvailable()
      src.addData(ev(9, 30001, 2, "view", 1.0)) // trigger
      q.processAllAvailable()
      val u1 = spark.table("sessions_ttl").as[EventPipeline.Session].collect()
        .filter(_.user_id == 1L).sortBy(_.start_epoch)
      // third emitted session RESTARTS at idx 1 (tombstone was expired)
      assert(u1.map(_.session_idx).toSeq == Seq(1L, 2L, 1L))
    } finally q.stop()
  }

  test("sequenceStream: idle close emits the batch userSequences row") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: six events split across two micro-batches (second batch
    // arrives out of order); maxLen=4 keeps the newest four
    val all = Seq(
      ev(0, 100, 1, "a", 0.0), ev(1, 200, 1, "b", 0.0),
      ev(2, 300, 1, "c", 0.0))
    val late = Seq(ev(4, 500, 1, "e", 0.0), ev(3, 400, 1, "d", 0.0),
      ev(5, 600, 1, "f", 0.0))
    val src = MemoryStream[Event]
    val q = EventPipeline.sequenceStream(
        src.toDS().withWatermark("ts", "10 seconds"),
        maxLen = 4, idleSeconds = 1000L)
      .writeStream.format("memory").queryName("seqs")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(all: _*)
      q.processAllAvailable()
      src.addData(late: _*)
      q.processAllAvailable()
      assert(spark.table("seqs").count() == 0) // user still active
      // another user drives the watermark past 600 + 1000, next trigger fires
      src.addData(ev(6, 5000, 2, "x", 0.0))
      q.processAllAvailable()
      src.addData(ev(7, 5001, 2, "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("seqs").as[EventPipeline.UserSeq].collect()
        .filter(_.user_id == 1L)
      // batch reference on the same closed episode
      val batch = graft.ops.Events.userSequences(
          (all ++ late).toDF(), maxLen = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .filter(_._1 == 1L).head
      assert(got.map(s => (s.user_id, s.n_events, s.seq)).toSeq ==
        Seq((batch._1, batch._2, batch._3)))
      assert(got.head.seq == "c,d,e,f" && got.head.n_events == 6L)
    } finally q.stop()
  }

  test("sessionize matches the batch operator on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(0, 0, 1, "click", 1.0), ev(1, 60, 1, "click", 2.0),
      ev(2, 4000, 1, "view", 3.0), ev(3, 10, 2, "click", 4.0))
    // batch reference
    val batch = graft.ops.Events.sessionize(events.toDF(), 1800L)
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // streaming: all in one batch, then a flush marker far in the future
    val src = MemoryStream[Event]
    val q = EventPipeline.sessionize(src.toDS(), 1800L)
      .writeStream.format("memory").queryName("sessions_cmp")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(events: _*)
      q.processAllAvailable()
      src.addData(ev(99, 1000000, 1, "end", 0.0), ev(100, 1000000, 2, "end", 0.0))
      q.processAllAvailable()
      val stream = spark.table("sessions_cmp")
        .orderBy("user_id", "session_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every batch session except the final open one per user is emitted;
      // the flush markers close them all
      assert(stream.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("sessionizeNative: session_window agrees with batch and the state machine") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(0, 100, 1, "click", 1.0), ev(1, 160, 1, "click", 2.0),
      ev(2, 4000, 1, "view", 3.0),  // user 1: two sessions
      ev(3, 110, 2, "click", 4.0), ev(4, 1000, 2, "view", 0.5)) // one session
    // batch reference on the shared columns (session_idx is the state
    // machine's extra — session_window can't see previous windows)
    val batch = graft.ops.Events.sessionize(events.toDF(), 1800L)
      .select("user_id", "n_events", "start_epoch", "end_epoch", "sum_value")
      .collect().map(_.toSeq).toSet
    val src = MemoryStream[Event]
    val q = EventPipeline.sessionizeNative(src.toDF(), 1800L,
        lateness = "10 seconds")
      .writeStream.format("memory").queryName("sessions_native")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(events: _*)
      q.processAllAvailable()
      // drive the watermark past every session's end + gap so append mode
      // emits them all; the flusher's own session stays open and unemitted
      src.addData(ev(99, 1000000, 9, "end", 0.0))
      q.processAllAvailable()
      val stream = spark.table("sessions_native").collect().map(_.toSeq).toSet
      assert(batch.nonEmpty && stream == batch,
        s"missing=${batch -- stream} extra=${stream -- batch}")
      // and against the custom state machine on the same rows (its own
      // batch parity is proven in the sessions_cmp case — this closes the
      // triangle directly)
      val src2 = MemoryStream[Event]
      val q2 = EventPipeline.sessionize(
          src2.toDS().withWatermark("ts", "10 seconds"),
          gapSeconds = 1800L, flushOnWatermark = true)
        .writeStream.format("memory").queryName("sessions_native_cmp")
        .outputMode(OutputMode.Append).start()
      try {
        src2.addData(events: _*)
        q2.processAllAvailable()
        src2.addData(ev(99, 1000000, 9, "end", 0.0))
        q2.processAllAvailable()
        src2.addData(ev(100, 1000001, 9, "end", 0.0)) // trigger the timeouts
        q2.processAllAvailable()
        val machine = spark.table("sessions_native_cmp")
          .select("user_id", "n_events", "start_epoch", "end_epoch", "sum_value")
          .collect().map(_.toSeq).toSet
        assert(machine == stream,
          s"machine=${machine -- stream} native=${stream -- machine}")
      } finally q2.stop()
    } finally q.stop()
  }

  test("hoppingCounts: stream agrees with the batch hopping-window answer") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val events = Seq(
      ev(0, 10, 1, "click", 1.5), ev(1, 800, 1, "click", 2.25),
      ev(2, 950, 2, "view", 5.0), ev(3, 3700, 2, "view", 0.75),
      ev(4, 1700, 3, "click", 4.0))
    // batch reference: the exact e07 expression on the same rows
    val batch = events.toDF()
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val src = MemoryStream[Event]
    val q = EventPipeline.hoppingCounts(src.toDF(), "1 hour", "15 minutes",
        lateness = "1 hour")
      .writeStream.format("memory").queryName("hopping")
      .outputMode(OutputMode.Update).start()
    try {
      src.addData(events: _*)
      q.processAllAvailable()
      val stream = spark.table("hopping").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(batch.nonEmpty && stream == batch,
        s"missing=${batch -- stream} extra=${stream -- batch}")
    } finally q.stop()
  }

  test("enrichedCounts: stream-static join agrees with the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val events = Seq(
      ev(0, 10, 1, "click", 1.0), ev(1, 800, 2, "view", 2.0),
      ev(2, 950, 3, "view", 3.0), ev(3, 3700, 1, "click", 4.0),
      ev(4, 1700, 9, "view", 5.0)) // user 9 has no dim row -> drops
    val dim = Seq((1L, "gold"), (2L, "silver"), (3L, "gold"))
      .toDF("cust_id", "tier")
    val batch = events.toDF()
      .join(dim.select(col("cust_id").as("user_id"), col("tier").as("dim_attr")),
        Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col("dim_attr"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("dim_attr"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val src = MemoryStream[Event]
    val q = EventPipeline.enrichedCounts(src.toDF(), dim, "cust_id", "tier",
        lateness = "1 hour")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Update).start()
    try {
      src.addData(events: _*)
      q.processAllAvailable()
      val stream = spark.table("enriched").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(batch.nonEmpty && stream == batch,
        s"missing=${batch -- stream} extra=${stream -- batch}")
    } finally q.stop()
  }

  test("attributionJoin: stream-stream interval join matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val views = Seq(
      ev(100, 10, 1, "view", 0), ev(101, 500, 1, "view", 0),
      ev(102, 20, 2, "view", 0), ev(103, 8000, 3, "view", 0))
    val purchases = Seq(
      ev(200, 600, 1, "purchase", 9),  // views 100+101 in the hour before
      ev(201, 4000, 2, "purchase", 9), // view 102 too old (3980s > 1h? no: 3980s > 3600)
      ev(202, 8100, 3, "purchase", 9)) // view 103 in window
    val batch = views.toDF().select(col("user_id"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .join(purchases.toDF().select(col("user_id").as("p_user"),
          col("ts").as("p_ts"), col("event_id").as("purchase_id")),
        col("user_id") === col("p_user") && col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 hour"))
      .select(col("user_id"), col("view_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == Set((1L, 100L, 200L), (1L, 101L, 200L), (3L, 103L, 202L)))
    val vs = MemoryStream[Event]
    val ps = MemoryStream[Event]
    val q = EventPipeline.attributionJoin(vs.toDF(), ps.toDF(),
        horizon = "1 hour", lateness = "1 hour")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      vs.addData(views: _*)
      ps.addData(purchases: _*)
      q.processAllAvailable()
      // advance both watermarks far past every window so all matches emit
      // (distinct users so the advancer rows cannot join each other)
      vs.addData(ev(900, 90000, 8, "view", 0))
      ps.addData(ev(901, 90000, 9, "purchase", 0))
      q.processAllAvailable()
      val stream = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(stream == batch, s"missing=${batch -- stream} extra=${stream -- batch}")
    } finally q.stop()
  }

  test("attributionJoin leftOuter: unconverted views emit null-extended") {
    implicit val sqlCtx = spark.sqlContext
    val vs = MemoryStream[Event]
    val ps = MemoryStream[Event]
    val q = EventPipeline.attributionJoin(vs.toDF(), ps.toDF(),
        horizon = "1 hour", lateness = "1 hour", joinType = "leftOuter")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append).start()
    try {
      vs.addData(ev(100, 10, 1, "view", 0),   // converts
        ev(101, 20, 2, "view", 0))            // never converts
      ps.addData(ev(200, 600, 1, "purchase", 9))
      q.processAllAvailable()
      // push both watermarks far past view 101's match window
      vs.addData(ev(900, 90000, 8, "view", 0))
      ps.addData(ev(901, 90000, 9, "purchase", 0))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toSet
      assert(rows.contains((100L, 200L)), s"matched pair missing: $rows")
      assert(rows.contains((101L, -1L)),
        s"unconverted view not null-extended: $rows")
    } finally q.stop()
  }

  private def pev(id: Long, sec: Long, user: Long, typ: String, v: Double,
      props: String) =
    EventPipeline.PropEvent(id, new Timestamp(sec * 1000L), user, typ, v, props)

  test("jsonPropStats: stream agrees with the batch JSON-extract answer") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val events = Seq(
      pev(0, 10, 1, "click", 1.0, """{"k": 7, "x": "a"}"""),
      pev(1, 700, 1, "click", 2.0, """{"x": "no k here"}"""),
      pev(2, 900, 2, "view", 3.0, """{"k": -2}"""),
      pev(3, 3700, 2, "view", 4.0, """{"k": 11}"""),
      pev(4, 3800, 3, "click", 5.0, "not json at all"))
    val batch = events.toDF()
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_with_k"), col("sum_k"),
        col("min_k"), col("max_k"))
      .collect().map(r => r.toSeq).toSet
    val src = MemoryStream[EventPipeline.PropEvent]
    val q = EventPipeline.jsonPropStats(src.toDF(), "$.k", lateness = "1 hour")
      .writeStream.format("memory").queryName("json_props")
      .outputMode(OutputMode.Update).start()
    try {
      src.addData(events: _*)
      q.processAllAvailable()
      val stream = spark.table("json_props").collect().map(_.toSeq).toSet
      assert(batch.nonEmpty && stream == batch,
        s"missing=${batch -- stream} extra=${stream -- batch}")
    } finally q.stop()
  }

  test("dedupStream drops re-delivered keys within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventPipeline.dedupStream(src.toDF(), Seq("event_id"),
        lateness = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(ev(1, 10, 1, "click", 1.0), ev(1, 10, 1, "click", 1.0),
        ev(2, 20, 1, "view", 2.0))
      q.processAllAvailable()
      src.addData(ev(1, 30, 1, "click", 1.0)) // re-delivery, later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("gapStream: per-user gaps match the batch lag window across batches") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(0, 0, 1, "click", 1.0), ev(1, 60, 1, "view", 2.0),
      ev(2, 10, 2, "click", 3.0), ev(3, 4000, 1, "click", 4.0),
      ev(4, 500, 2, "buy", 5.0))
    // batch reference: the lag stage of interEventGaps
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lag, unix_micros}
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = events.toDF()
      .select(col("event_type"), col("event_id"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // streaming: split across two micro-batches (event-time ordered
    // per user across the split — the documented arrival contract)
    val src = MemoryStream[Event]
    val q = EventPipeline.gapStream(src.toDS())
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(events.take(3): _*)
      q.processAllAvailable()
      src.addData(events.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("gap_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batch)
      assert(got.size == 3) // one gap per event beyond each user's first
    } finally q.stop()
  }

  test("transitionStream: per-user (prev -> next) pairs match the batch " +
    "lag stage across batches") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(0, 0, 1, "click", 1.0), ev(1, 60, 1, "view", 2.0),
      ev(2, 10, 2, "click", 3.0), ev(3, 4000, 1, "click", 4.0),
      ev(4, 500, 2, "buy", 5.0))
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lag}
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = events.toDF()
      .select(lag(col("event_type"), 1).over(w).as("prev_type"),
        col("event_type").as("next_type"), col("event_id"))
      .filter(col("prev_type").isNotNull)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val src = MemoryStream[Event]
    val q = EventPipeline.transitionStream(src.toDS())
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(events.take(3): _*)
      q.processAllAvailable()
      src.addData(events.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("trans_stream").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == batch && got.size == 3)
      // the cross-batch transition (view@60 -> click@4000 for user 1)
      // rode the state store
      assert(got.contains(("view", "click", 3L)))
    } finally q.stop()
  }

  test("scd2Stream: closed validity intervals equal the batch " +
    "scd2History's non-current rows, across batches (runs split over " +
    "micro-batch boundaries close correctly)") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(0, 10, 1, "view", 0.0), ev(1, 20, 1, "view", 0.0),
      ev(2, 30, 1, "click", 0.0),
      ev(3, 15, 2, "buy", 0.0),
      // batch 2: user 1's click run (started batch 1) closes here;
      // user 2's buy run survives untouched (same type)
      ev(4, 40, 1, "view", 0.0), ev(5, 50, 2, "buy", 0.0))
    val batchClosed = graft.ops.Events.scd2History(events.toDF())
      .filter(org.apache.spark.sql.functions.col("valid_to_us").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val src = MemoryStream[Event]
    val q = EventPipeline.scd2Stream(src.toDS())
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(events.take(4): _*)
      q.processAllAvailable()
      src.addData(events.drop(4): _*)
      q.processAllAvailable()
      val got = spark.table("scd2_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == batchClosed && got.size == 2)
      // the cross-batch close: user 1's click@30 run closed by view@40
      assert(got.contains((1L, "click", 30000000L, 40000000L)))
    } finally q.stop()
  }

  test("unitMetricStream: streamed unit cells equal the batch rollup " +
    "and finish to the batch welchT, across micro-batches") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // (exp, user, variant, cents) — user 10's metric accumulates ACROSS
    // micro-batches, the case a naive arm-level sum-of-squares fold
    // would get wrong
    val evs = Seq(
      ("A", 10L, 0L, 100L), ("A", 11L, 0L, 300L), ("A", 20L, 1L, 250L),
      ("A", 10L, 0L, 50L), ("A", 21L, 1L, 150L), ("A", 22L, 1L, 500L),
      ("B", 30L, 0L, 10L), ("B", 31L, 0L, 30L), ("B", 40L, 1L, 20L),
      ("B", 41L, 1L, 60L))
    val src = MemoryStream[(String, Long, Long, Long)]
    val q = EventPipeline.unitMetricStream(
        src.toDF().toDF("exp", "user_id", "variant", "cents"),
        "exp", "user_id", "variant", "cents")
      .writeStream.format("memory").queryName("unit_metrics")
      .outputMode(OutputMode.Complete).start()
    try {
      src.addData(evs.take(4): _*)
      q.processAllAvailable()
      src.addData(evs.drop(4): _*)
      q.processAllAvailable()
      val streamed = spark.table("unit_metrics")
      val batch = evs.toDF("exp", "user_id", "variant", "cents")
        .groupBy("exp", "user_id", "variant")
        .agg(sum("cents").as("metric"))
      def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
          r.getLong(3)).toMap
      assert(cells(streamed) == cells(batch))
      // read-side finisher over the SINK equals the batch decision
      def tmap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      assert(
        tmap(graft.ops.Events.welchT(streamed, "exp", "variant", "metric")) ==
        tmap(graft.ops.Events.welchT(batch, "exp", "variant", "metric")))
    } finally q.stop()
  }
}
