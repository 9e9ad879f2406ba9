package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sql.SpjCompiler

/** CLI analog of the reference's QueryMain (reference:
  * src/QueryMain.java — reads an SPJ-dialect .sql file, executes it,
  * writes the result): `runMain graft.SpjMain <query.sql|inline-sql>
  * <tableDir> [outParquetDir]`. Without an output dir, prints up to 50
  * rows to stdout.
  */
object SpjMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SpjMain <query.sql | inline query text> <tableDir> [outDir]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    execute(spark, args(0), args(1), args.lift(2))
    spark.stop()
  }

  /** The CLI body, session-independent so a spec can drive it (r8 —
    * the one surface that was still only manually verified): resolve
    * file-or-inline query text, compile + run against `dir`'s tables,
    * write parquet to `out` or print to stdout.
    */
  def execute(spark: SparkSession, query: String, dir: String,
      out: Option[String]): Unit = {
    val queryText =
      if (Files.exists(Paths.get(query)))
        new String(Files.readAllBytes(Paths.get(query)), "UTF-8")
      else query
    val result = SpjCompiler.run(spark, dir, queryText)
    out match {
      case Some(o) =>
        result.write.mode("overwrite").parquet(o)
        println(s"[spj] wrote $o")
      case None =>
        result.show(50, truncate = false)
    }
  }
}
