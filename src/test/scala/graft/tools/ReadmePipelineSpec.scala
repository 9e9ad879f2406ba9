package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Clusters, Dedup, TextOps}

/** The README "Typical pipeline" snippet, executed: docs that run cannot
  * rot. Each stage is the snippet's call with the snippet's argument
  * shapes on a corpus small enough to assert outcomes exactly.
  */
class ReadmePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("the README pipeline runs end-to-end: fold -> curate -> epoch") {
    // a standing corpus, its labels, and an incoming batch
    val good = "the cat sat on the mat and the dog sat on the log " +
      "while a bird of the hour sang its morning song to all of us"
    val corpus = Seq(
      (1L, good),
      (2L, good.replace("morning", "evening")), // near-dup of 1
      (3L, "completely different words entirely in this document " +
        "with the air of a long and winding second sentence of prose"))
      .toDF("doc_id", "text")
    val labels = Clusters.connectedComponents(
      Dedup.nGramJaccard(corpus, "text", "doc_id", 1, 2), "id_a", "id_b")
    val batch = Seq(
      (10L, good), // exact dup -> rejected by the fold
      (11L, "fresh admitted content for the epoch with all of the " +
        "stopwords a corpus quality gate could ever want to see here"))
      .toDF("doc_id", "text")

    // ingest: fold a batch into the standing corpus (idempotent)
    val fold = CorpusMaintain.foldBatch(corpus, labels, batch,
      "text", "doc_id", expectedItems = 100L)
    assert(fold.admitted.collect().map(_.getLong(0)).toSet == Set(11L))
    assert(fold.corpus.count() == 4L)

    // curate: scrub -> quality gate -> dedup keep-best -> split
    val clean = Dedup.scrubRepeatedLines(fold.corpus, "text", "doc_id", 10)
      .filter(TextOps.gopherPass(col("text"), 5, 100000))
    assert(clean.count() == 4L) // every doc passes the relaxed word floor
    val keep = Clusters.keepBestPerCluster(
      Dedup.nGramJaccard(clean, "text", "doc_id", 1, 2), "id_a", "id_b",
      clean.select(col("doc_id"), TextOps.qualityScore(col("text"))
        .as("q")), "doc_id", "q")
    // docs 1/2 are one near-dup cluster: exactly one winner
    assert(keep.count() == 1L)

    // materialize one training epoch: shuffle -> shards -> mask table
    val epoch = EpochBuild.build(clean, "doc_id", "text", seed = "epoch0",
      shardTokens = 40L, seqLen = 16)
    assert(epoch.order.count() == 4L)
    assert(epoch.boundaries.count() > 0L)
    val out = java.nio.file.Files.createTempDirectory("readme").toString
    EpochBuild.write(epoch, out, "epoch0")
    assert(spark.read.parquet(s"$out/epoch=epoch0/order.parquet")
      .count() == 4L)
  }
}
