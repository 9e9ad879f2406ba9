package graft.tools

import org.apache.spark.sql.SparkSession

/** 30× scaling rehearsal of the five scale-critical dedup operators —
  * the step beyond ScaleSmoke's 10×. A super-linearity with a small
  * exponent can hide inside a 10× step (d31's banded-DP verify looked
  * linear at 10× in r11 yet blew past its class on the driver host);
  * a 30× step over the same seeded generator (ScaleSmoke.generate —
  * constant gram/line document frequencies as N grows, so growth here is
  * STRUCTURAL, not density-driven) raises any hidden exponent above the
  * noise floor: time ∝ N^α shows as ratio 30^α, and the reported
  * `alpha` = ln(ratio)/ln(30) names the measured exponent directly.
  *
  * Ops and declared classes (mirroring the 10× smoke):
  *  - d02 (gram-inverted-index Jaccard), d34 (PPJoin two-sided prefix),
  *    d37 (transitive-contamination BFS over the pair frame), d31
  *    (banded-DP edit distance on cold-gram candidates), d41 (pairwise
  *    ExactSubstr window join, new r14): CANDIDATE class — pair work
  *    tracks candidate count, ~linear on this corpus; bound 6× headroom
  *    over proportional growth (= 180 at 30×), the same headroom factor
  *    the 10× smoke allows (60 at 10×).
  *  - d10 (SemDeDup cluster-then-pairs at query-pinned k=10): QUADRATIC
  *    BASELINE by contract — report-only, wall-capped, because cluster
  *    populations grow with N at fixed k; its scale path is raising k
  *    with N (the op takes k as a parameter; the query pins it).
  *  - r14 additions beyond the d-tier (verdict #2 — the d02-class
  *    discipline applied to the t/s tiers): t47 (TextRank — worst
  *    non-quadratic 10× ratio last round, 6.3), t37 (KN trigram — the
  *    type/occurrence factoring is exactly the claim a 30× run
  *    validates), s22 (IVF tuning sweep vs corpus): declared LINEAR,
  *    bound 3× headroom (= 90 at 30×, vs the smoke's 1.5× at 10× —
  *    sub-linear constants wash out over a longer step, so the wider
  *    envelope keeps the run a measurement, not a coin flip; `alpha`
  *    is the finding either way). d05 (exact all-pairs cosine):
  *    QUADRATIC BASELINE by contract, report-only, 900 s wall (30² =
  *    900× proportional work is the declared envelope being confirmed).
  *
  * `runMain graft.tools.ScaleRehearsal [workDir]` (env SPARK_GRAFT_CPUS)
  * — prints one JSON line and writes scalerehearsal_last.json with
  * per-op (base, x30, ratio, alpha, class, verdict).
  */
object ScaleRehearsal {
  private val Scale = 30.0

  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft_scalerehearsal")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ScaleSmoke.generate(spark, s"$workDir/base", nDocs = 5000L, nVecs = 2000L)
    ScaleSmoke.generate(spark, s"$workDir/x30",
      nDocs = (5000L * Scale).toLong, nVecs = (2000L * Scale).toLong)

    def timed(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    // (name, class, ratio bound, x30 wall cap seconds)
    val ops = Seq(
      ("d02_dedup_jaccard", "candidate", 6.0 * Scale, 600.0),
      ("d34_prefix_jaccard", "candidate", 6.0 * Scale, 600.0),
      ("d37_transitive_contamination", "candidate", 6.0 * Scale, 600.0),
      ("d31_edit_distance", "candidate", 6.0 * Scale, 600.0),
      ("d41_substring_dedup", "candidate", 6.0 * Scale, 600.0),
      // e40 (r15 slot, the r14 verdict's ask): FIXED 720-hour horizon
      // at every N, so the C(H,2) pair/median stage is constant and
      // only the hourly rollup scales — the ratio should sit well
      // under linear, which is exactly the factoring claim to check
      ("e40_theil_sen", "linear", 3.0 * Scale, 600.0),
      ("t47_textrank", "linear", 3.0 * Scale, 600.0),
      ("t37_kn_trigram", "linear", 3.0 * Scale, 600.0),
      ("s22_ivf_tuning", "linear", 3.0 * Scale, 600.0),
      ("d10_dedup_semantic", "quad_baseline", Double.PositiveInfinity, 600.0),
      ("d05_dedup_embedding", "quad_baseline", Double.PositiveInfinity, 900.0))

    val rows = ops.map { case (name, cls, bound, wall) =>
      timed(name, s"$workDir/base") // codegen + JIT warm, untimed
      val base = timed(name, s"$workDir/base")
      val big = timed(name, s"$workDir/x30")
      val ratio = big / math.max(base, 0.05)
      val alpha = math.log(math.max(ratio, 1.0)) / math.log(Scale)
      val ok = ratio <= bound && big < wall
      System.err.println(f"[rehearsal] $name base=$base%.2fs x30=$big%.2fs " +
        f"ratio=$ratio%.1f alpha=$alpha%.2f class=$cls ok=$ok")
      require(ratio <= bound,
        f"$name super-linear at 30x: $ratio%.1fx > $bound%.0fx (alpha $alpha%.2f)")
      require(big < wall, f"$name wall cap: $big%.0fs at x30 scale")
      (name, cls, base, big, ratio, alpha)
    }

    val js = rows.map { case (n, c, b, x, r, a) =>
      f""""$n":{"class":"$c","base_sec":$b%.2f,"x30_sec":$x%.2f,"ratio":$r%.2f,"alpha":$a%.3f,"verdict":"pass"}"""
    }.mkString("{", ",", "}")
    val line = s"""{"probe":"x30_rehearsal","scale":${Scale.toInt},"cpus":$cpus,"ops":$js}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scalerehearsal_last.json"), line + "\n")
    spark.stop()
  }
}
