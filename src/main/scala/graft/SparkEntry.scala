package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CorpusPack, PipelinePack, Relational, SqlPack}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query packs; each pack contributes (name, runner, optional oracle). */
  private def packs: Seq[Relational.Q] =
    Relational.all ++ SqlPack.all ++ PipelinePack.all ++ CorpusPack.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_join4_filter_sort")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
