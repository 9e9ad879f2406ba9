package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, printing one JSON line with per-query seconds.
  *
  * Methodology:
  *  - a warmup pass at sf0.001 first (JVM JIT + per-query codegen), so the
  *    timed pass measures the engine, not classloading;
  *  - results go to the `noop` sink — count() would let Catalyst prune the
  *    plan down to a row count and under-measure;
  *  - each query runs SPARK_GRAFT_REPS times (default 3); reported seconds
  *    are the MEDIAN, with per-query max-min in "spread" — single-shot
  *    timings in a shared JVM swing 2x on GC/compilation debt and cannot
  *    distinguish a regression from noise;
  *  - a fixed seeded CALIBRATION workload (30M-row hash + 1M-key groupBy,
  *    no file I/O, independent of SF) runs in the same session and its
  *    median lands in "calibration_sec" — round-over-round totals are only
  *    comparable after normalizing by it, because the sandbox the bench
  *    runs on drifts 2–8× between rounds (r6 burned a day proving an
  *    apparent 1.35× "regression" was entirely the host).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // dozens of queries run in this one JVM: keep status-listener state
      // small so late queries aren't measured against accumulated debt
      .config("spark.sql.ui.retainedExecutions", "2")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String, dir: String): Boolean = {
      System.err.println(s"[bench] start $name on $dir")
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        System.err.println(f"[bench] done  $name in ${(System.nanoTime() - t0) / 1e9}%.2fs")
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed on $dir: ${e.getMessage}")
          false
      } finally {
        // queries that localCheckpoint (CC loops, d11's pair list) leave
        // persisted RDD blocks behind after their action completes;
        // across 60+ queries × reps that debt skews later timings (r4:
        // d08 spread 72 s). Nothing references them once the query's
        // action is done — drop them eagerly.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }

    // calibration: fixed CPU+shuffle work whose true cost is host-invariant;
    // median of 3 after one warm rep
    def calibrationOnce(): Double = {
      System.gc()
      val t0 = System.nanoTime()
      spark.range(0L, 30000000L, 1L, cpus.toInt * 4)
        .selectExpr("xxhash64(id) AS h", "pmod(xxhash64(id, 7), 1000000) AS k")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.max("h"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // SPARK_GRAFT_ONLY=q01,d02 restricts the run (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    names.foreach(exec(_, warmDir)) // warmup, untimed

    val results = names.map { name =>
      val times = (1 to reps).map { _ =>
        // nudge the context cleaner: broadcast/shuffle cleanup is GC-driven,
        // and a large rarely-collected heap lets debt leak into later timings
        System.gc()
        val t0 = System.nanoTime()
        val ok = exec(name, sfDir)
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val good = times.filter(_ >= 0).sorted
      val median = if (good.isEmpty) -1.0 else good(good.size / 2)
      val spread = if (good.isEmpty) -1.0 else good.last - good.head
      (name, median, spread, times)
    }
    calibrationOnce() // warm (codegen for the calibration plan itself)
    val calib = Seq(calibrationOnce(), calibrationOnce(), calibrationOnce())
      .sorted.apply(1)
    System.err.println(f"[bench] calibration_sec = $calib%.3f")

    def js(kvs: Seq[(String, Double)]) = kvs
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    // every rep, in run order (r8): a median hides a one-off pathology —
    // r7's p12 showed spread 107 s against a 9 s median on the driver host
    // and the artifact couldn't say WHICH rep (first = compile/debt,
    // middle = external interference). reps_sec makes outliers attributable.
    def jsArr(kvs: Seq[(String, Seq[Double])]) = kvs
      .map { case (k, vs) =>
        "\"" + k + "\":[" + vs.map(v => f"$v%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // normalized total (r7 ask): REF_CAL is the calibration median measured
    // on the reference host when the r7 artifact was locked in — dividing
    // by the current host's calibration expresses this run's total in
    // reference-host seconds, so round-over-round totals compare directly
    val RefCal = 2.053
    val totalNorm = if (calib > 0) total * RefCal / calib else -1.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","value_normalized":${
      f"$totalNorm%.3f"},"queries":${
      js(results.map(r => r._1 -> r._2))},"spread":${
      js(results.map(r => r._1 -> r._3))},"reps_sec":${
      jsArr(results.map(r => r._1 -> r._4))},"reps":$reps,"calibration_sec":${
      f"$calib%.3f"},"ref_calibration_sec":$RefCal,"sf":"$sfDir"}"""
    // persist the FULL line (per-rep arrays included) as a machine-readable
    // artifact (r6): stdout capture has truncated mid-dict before, and
    // round-over-round comparison should never depend on it.
    // SPARK_GRAFT_BENCH_OUT overrides; empty disables.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    if (outPath.nonEmpty) {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
        line + "\n")
      System.err.println(s"[bench] wrote $outPath")
    }
    spark.stop()
    // stdout contract with the driver (r10: BENCH_r10.json came back
    // `parsed: null` with only a tail fragment — the 40 KB full line got
    // chopped in capture). Print a COMPACT line (no per-rep arrays, no
    // spread — those live in bench_last.json) as the very last stdout
    // line, after spark.stop(), behind a fixed marker and bare.
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","value_normalized":${
      f"$totalNorm%.3f"},"queries":${
      js(results.map(r => r._1 -> r._2))},"reps":$reps,"calibration_sec":${
      f"$calib%.3f"},"ref_calibration_sec":$RefCal,"sf":"$sfDir"}"""
    println(s"BENCH_JSON: $compact")
    println(compact)
    System.out.flush()
  }
}
