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
    val queryText =
      if (Files.exists(Paths.get(args(0))))
        new String(Files.readAllBytes(Paths.get(args(0))), "UTF-8")
      else args(0)
    val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = SpjCompiler.run(spark, dir, queryText)
    if (args.length >= 3) {
      result.write.mode("overwrite").parquet(args(2))
      println(s"[spj] wrote ${args(2)}")
    } else {
      result.show(50, truncate = false)
    }
    spark.stop()
  }
}
