package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, printing one JSON line with per-query seconds.
  *
  * Methodology:
  *  - a warmup pass at sf0.001 first (JVM JIT + per-query codegen), so the
  *    timed pass measures the engine, not classloading;
  *  - results go to the `noop` sink — count() would let Catalyst prune the
  *    plan down to a row count and under-measure.
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
      }
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(exec(_, warmDir)) // warmup, untimed

    val results = names.map { name =>
      // nudge the context cleaner: broadcast/shuffle cleanup is GC-driven,
      // and a large rarely-collected heap lets debt leak into later timings
      System.gc()
      val t0 = System.nanoTime()
      val ok = exec(name, sfDir)
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
