package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assemble documents into fixed-token-budget training
  * sequences. Two strategies, both sharded so no single task ever sees
  * more than `shardDocs` documents:
  *
  *  - [[chunkPack]] — concatenate-and-chunk (GPT-style): documents in id
  *    order form one logical token stream per shard; sequence boundaries
  *    fall every `budget` tokens of cumulative length, so documents may
  *    straddle two sequences. Pure window arithmetic over integers —
  *    fully expressible in SQL, oracle-checked bit-for-bit.
  *
  *  - [[greedyPack]] — document-boundary-respecting first-fit-decreasing
  *    bin packing within each shard: no document is split, no sequence
  *    exceeds the budget (unless a single document alone does). The
  *    per-shard packing loop is genuinely sequential, so it runs as
  *    compiled Scala over each group; determinism comes from the fixed
  *    (tokens desc, id asc) placement order. Verified by PackSpec gates
  *    (exactly-once coverage, budget bound, determinism), not SQL.
  *
  * Scale: the shard key is `id DIV shardDocs` — contiguous, dense, and
  * computable at the scan, so the only exchange is the shard partition
  * itself. Per-task state is O(shardDocs) for the window cumsum and
  * O(bins-per-shard) for first-fit. At 100 TB, shardDocs just bounds task
  * memory; shard count grows with the corpus.
  */
object Packing {

  /** Per-sequence summary of concatenate-and-chunk packing: one row per
    * (shard, seq_idx) with document count, token count, and the covered
    * id range. A document belongs to the sequence where its FIRST token
    * lands (`tokens-before DIV budget`).
    */
  def chunkPack(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      shardDocs: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id"),
        TextOps.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("shard", expr(s"id DIV $shardDocs"))
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("seq_idx", expr(s"(cum - n_tok) DIV $budget"))
      .groupBy("shard", "seq_idx")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        min("id").as("first_doc"),
        max("id").as("last_doc"))
  }

  /** Attention-mask boundary table for [[chunkPack]]'s token stream: one
    * row per (document, sequence) INTERSECTION — which slice of each
    * packed sequence belongs to which document. Packed pretraining needs
    * exactly this to reset attention/loss at document boundaries; the
    * summary rows [[chunkPack]] emits can't reconstruct it once a
    * document straddles sequences.
    *
    * Arithmetic: with `pre`/`cum` the exclusive/inclusive cumulative
    * token counts in the shard stream, a document covers sequences
    * `pre DIV budget .. (cum−1) DIV budget`; its slice of sequence c is
    * `[max(pre, c·budget), min(cum, (c+1)·budget))` rebased to the
    * sequence. One window cumsum (per-shard, same as chunkPack) + an
    * `explode(sequence(...))` whose fan-out is 1 + spanned-boundary
    * count — output rows ≈ docs + sequences, never docs × sequences.
    * Empty documents carry no tokens and emit no mask row.
    */
  def chunkBoundaries(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      shardDocs: Int,
      countExpr: Column => Column = TextOps.tokenCount): DataFrame =
    chunkBoundariesFromCounts(
      df.select(col(idCol).as("id"),
        countExpr(col(textCol)).cast("long").as("n_tok")),
      budget, shardDocs)

  /** [[chunkBoundaries]] over PRE-COMPUTED token counts — input is
    * (`id`, `n_tok`) rows. Split out so callers that already hold counts
    * (the epoch order table, a delta continuation seeded with the
    * standing tail's rows) can pack without re-touching text.
    */
  def chunkBoundariesFromCounts(
      counts: DataFrame,
      budget: Int,
      shardDocs: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.select(col("id"), col("n_tok").cast("long").as("n_tok"))
      .withColumn("shard", expr(s"id DIV $shardDocs"))
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("pre", col("cum") - col("n_tok"))
      .filter(col("n_tok") > 0)
      .select(col("shard"), col("id").as("doc_id"), col("pre"), col("cum"),
        explode(sequence(expr(s"pre DIV $budget"),
          expr(s"(cum - 1) DIV $budget"))).as("seq_idx"))
      .select(col("shard"), col("seq_idx"), col("doc_id"),
        (greatest(col("pre"), col("seq_idx") * budget) -
          col("seq_idx") * budget).as("start"),
        (least(col("cum"), (col("seq_idx") + 1) * budget) -
          greatest(col("pre"), col("seq_idx") * budget)).as("len"))
  }

  /** Per-document bin assignment of first-fit-decreasing packing within
    * each shard: (shard, bin_idx, id, n_tok). Placement order is tokens
    * descending then id ascending; each document goes to the lowest-index
    * bin with room, else opens a new bin. A document longer than the
    * budget gets a bin of its own.
    */
  def greedyPack(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      shardDocs: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).as("id"),
        TextOps.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("shard", expr(s"id DIV $shardDocs"))
      .select("shard", "id", "n_tok")
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, docs) =>
        val sorted = docs.map { case (_, id, n) => (id, n) }.toArray
          .sortBy { case (id, n) => (-n, id) }
        // (remaining capacity, rows) per bin, in creation order
        val bins = scala.collection.mutable.ArrayBuffer
          .empty[(Int, scala.collection.mutable.ArrayBuffer[(Long, Int)])]
        sorted.foreach { case (id, n) =>
          bins.indexWhere(_._1 >= n) match {
            case -1 =>
              val rows = scala.collection.mutable.ArrayBuffer((id, n))
              bins += ((math.max(budget - n, 0), rows))
            case i =>
              val (cap, rows) = bins(i)
              rows += ((id, n))
              bins(i) = (cap - n, rows)
          }
        }
        bins.iterator.zipWithIndex.flatMap { case ((_, rows), binIdx) =>
          rows.iterator.map { case (id, n) => (shard, binIdx.toLong, id, n) }
        }
      }
      .toDF("shard", "bin_idx", "id", "n_tok")
  }
}
