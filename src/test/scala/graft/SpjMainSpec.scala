package graft

import java.nio.file.Files

import graft.sql.SpjCompiler

/** Spec-drives the SpjMain CLI body (r8 — previously the one surface
  * verified only by a manual round-1 run): a .sql FILE on disk, a table
  * dir, a parquet output dir — the full file-in/parquet-out contract,
  * checked against the compiler invoked directly.
  */
class SpjMainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("CLI: .sql file against a table dir writes the compiler's rows as parquet") {
    val tmp = Files.createTempDirectory("spjmain")
    val sqlFile = tmp.resolve("q.sql")
    Files.writeString(sqlFile, graft.queries.SqlPack.q14Text)
    val outDir = tmp.resolve("out").toString
    SpjMain.execute(spark, sqlFile.toString, dir, Some(outDir))
    // --explain surface: join order line + a physical plan, no execution
    val ex = SpjMain.explainText(spark, sqlFile.toString, dir)
    assert(ex.startsWith("join order: "), ex.take(80))
    assert(ex.contains("Physical Plan"), ex.take(200))
    val written = spark.read.parquet(outDir)
    val direct = SpjCompiler.run(spark, dir, graft.queries.SqlPack.q14Text)
    assert(written.columns.sorted.sameElements(direct.columns.sorted))
    val key = written.columns.sorted.head
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*).collect().map(_.toSeq).toSet
    assert(rows(written) == rows(direct) && rows(written).nonEmpty)
  }

  test("CLI: inline query text (no file) runs through the same path") {
    val tmp = Files.createTempDirectory("spjmain2")
    val outDir = tmp.resolve("out").toString
    SpjMain.execute(spark,
      """SELECT NATION.n_name FROM NATION WHERE NATION.n_regionkey = "2"""",
      dir, Some(outDir))
    assert(spark.read.parquet(outDir).count() > 0)
  }
}
