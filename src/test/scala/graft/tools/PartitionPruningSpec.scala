package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Partitioned-layout pruning demo: documents written `lang=.../` and a
  * language-filtered read must prune at the DIRECTORY level
  * (PartitionFilters), not scan-then-filter — the storage decision that
  * makes "just the English slice" touch 1/N of a 100 TB corpus.
  */
class PartitionPruningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("filter on the partition column becomes a PartitionFilter") {
    val base = Files.createTempDirectory("graft_part").toString
    try {
      val docs = Tables.load(spark, dir, "documents")
      TableTools.writePartitioned(docs, s"$base/docs", "lang")
      val read = spark.read.parquet(s"$base/docs")
        .filter(col("lang") === "en")
        .select("doc_id", "n_chars")
      val p = read.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // pruning happens in partition discovery, not as a data filter
      val pf = p.linesIterator
        .find(_.trim.startsWith("PartitionFilters")).getOrElse("")
      assert(pf.contains("lang"), s"expected lang in PartitionFilters:\n$p")
      val df = p.linesIterator
        .find(_.trim.startsWith("PushedFilters")).getOrElse("")
      assert(!df.contains("lang"),
        "partition-column filter must not degrade to a row-level filter")
      // and the result is the same slice the unpartitioned table gives
      val expected = docs.filter(col("lang") === "en").count()
      assert(read.count() == expected && expected > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
