package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Packing, TextOps}

/** Epoch materialization: turn a curated corpus into the three tables a
  * training job actually reads, in ONE composed pass — the write-side
  * counterpart of [[CorpusMaintain]]'s ingest fold, tying together the
  * ordering/sharding/packing operators (p13/p14/p15):
  *
  *  1. ORDER — seeded deterministic shuffle ([[Corpus.seededShuffle]]):
  *     dense train positions from md5(seed:id); a new seed is a fresh
  *     epoch permutation with no other input change.
  *  2. SHARD — token-budgeted output files ([[Corpus.budgetShards]] over
  *     the train positions): each shard holds a contiguous run of the
  *     epoch order filling to `shardTokens`, so readers stream shards
  *     sequentially and resume mid-epoch at a shard boundary.
  *  3. PACK — fixed-`seqLen` sequence boundaries in epoch order
  *     ([[Packing.chunkBoundaries]] keyed on train_pos): the
  *     attention/loss-mask segments for every packed sequence.
  *
  * Determinism: every stage is a pure function of (corpus, seed,
  * budgets) — no RNG, no timestamps — so re-building an epoch is
  * byte-identical (spec-asserted), which is what makes mid-training
  * re-materialization after data loss safe.
  *
  * Scale shape: the only non-map machinery is the shared
  * range-partition + broadcast-offset prefix sum (positions, shard
  * boundaries) and the per-group window cumsum inside packing — all
  * rehearsed in ScaleProbe at 50M rows. Text never shuffles; every
  * table carries ids and integers only.
  */
object EpochBuild {

  /** One epoch's tables: `order` (doc_id, train_pos, n_tok, shard_id),
    * `boundaries` (pack_shard, seq_idx, doc_id, start, len).
    */
  final case class Epoch(order: DataFrame, boundaries: DataFrame)

  /** `bpeMerges`: when supplied (from [[TextOps.trainBpeMerges]] or a
    * persisted merge table), every token count in the epoch — shard
    * budgets AND packed-sequence boundaries — uses the TRAINED tokenizer
    * ([[TextOps.bpeTokenCountTrained]]) instead of the whitespace
    * heuristic, so `seqLen` is the model's ACTUAL context length and
    * boundary `start`/`len` are real token offsets. The heuristic
    * undercounts OOV subword fan-out (measured in BpeFidelitySpec);
    * packing on it overfills real contexts.
    */
  private def resolveCountExpr(
      bpeMerges: Option[Seq[(String, String)]],
      unigramPieces: Option[Map[String, Double]],
      byteBpeMerges: Option[Seq[(String, String)]])
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    require(Seq(bpeMerges, unigramPieces, byteBpeMerges).count(_.nonEmpty) <= 1,
      "supply ONE tokenizer: bpeMerges, unigramPieces, or byteBpeMerges")
    unigramPieces.map(pcs =>
        (c: org.apache.spark.sql.Column) => TextOps.unigramTokenCount(c, pcs))
      .orElse(bpeMerges.map(m =>
        (c: org.apache.spark.sql.Column) => TextOps.bpeTokenCountTrained(c, m)))
      .orElse(byteBpeMerges.map(m =>
        (c: org.apache.spark.sql.Column) => TextOps.byteBpeTokenCount(c, m)))
      .getOrElse(TextOps.tokenCount _)
  }

  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seed: String,
      shardTokens: Long,
      seqLen: Int,
      packShardDocs: Int = 1 << 20,
      bpeMerges: Option[Seq[(String, String)]] = None,
      unigramPieces: Option[Map[String, Double]] = None,
      byteBpeMerges: Option[Seq[(String, String)]] = None): Epoch = {
    val countExpr = resolveCountExpr(bpeMerges, unigramPieces, byteBpeMerges)
    val toks = docs.select(col(idCol).as("doc_id"),
      countExpr(col(textCol)).cast("long").as("n_tok"))
    val order = Corpus.seededShuffle(
      toks.select(col("doc_id")), "doc_id", seed)
    val withTok = order.join(toks, "doc_id")
    val sharded = Corpus.budgetShards(
      withTok, Seq("train_pos"), "n_tok", shardTokens)
      .select("doc_id", "train_pos", "n_tok", "shard_id")
    // pack in epoch order: train_pos is the packing id, so sequences
    // concatenate the shuffled stream; doc_id re-attaches afterwards
    val posDocs = withTok.join(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
      "doc_id")
    val bounds = Packing.chunkBoundaries(
      posDocs.select(col("train_pos"), col("__text")),
      "train_pos", "__text", seqLen, packShardDocs, countExpr)
      .withColumnRenamed("shard", "pack_shard")
      .withColumnRenamed("doc_id", "train_pos")
      .join(withTok.select("doc_id", "train_pos"), "train_pos")
      .select("pack_shard", "seq_idx", "doc_id", "start", "len")
    Epoch(sharded, bounds)
  }

  /** Epoch DELTA materialization — the missing epoch leg of
    * [[ReleaseBuild.deltaCut]]: fold a batch of NEW documents into a
    * standing epoch WITHOUT touching the standing tables, emitting
    * append-only delta shards a trainer consumes after the base epoch.
    *
    * The appended-epoch permutation is defined as: standing docs keep
    * their frozen positions 0..N−1 (a mid-training reader has already
    * consumed a prefix — reshuffling them is exactly what a delta must
    * NOT do), and batch docs take positions N.. in seeded order among
    * themselves. Under that definition the delta is EXACT (spec-asserted
    * ≡ a from-scratch build of the appended corpus):
    *
    *  - '''order/shards''': batch prefix sums continue the standing
    *    total T ([[Corpus.budgetShards]] `offset = T`), so the first
    *    delta docs fill the base's final partially-filled shard (same
    *    `shard_id` — a reader treats that shard as base part + delta
    *    part) and later docs open fresh shards.
    *  - '''boundaries''': the boundary pack-shard (`N div packShardDocs`)
    *    is seeded with the base ORDER rows ≥ its start — (train_pos,
    *    n_tok) pairs, ids + integers only, never text — so the window
    *    cumsum reproduces the standing prefix exactly and delta
    *    sequences continue the shard's tail sequence mid-fill. Base
    *    boundary rows are recomputed identically and dropped
    *    (append-only windows are prefix-stable: later rows cannot
    *    change earlier rows' cum).
    *
    * [[manifest]] over the returned delta covers the delta's per-shard
    * CONTRIBUTION; for the one shared boundary shard a consumer merges
    * base + delta rows (n_docs/n_tokens add; the checksum covers each
    * side's own id run).
    *
    * Scale shape: cost is batch-proportional — the only standing-side
    * reads are one (count, sum) aggregate over the order table and the
    * ≤ packShardDocs boundary-shard rows; standing text is never read.
    */
  def deltaBuild(
      baseOrder: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      seed: String,
      shardTokens: Long,
      seqLen: Int,
      packShardDocs: Int = 1 << 20,
      bpeMerges: Option[Seq[(String, String)]] = None,
      unigramPieces: Option[Map[String, Double]] = None,
      byteBpeMerges: Option[Seq[(String, String)]] = None): Epoch = {
    val countExpr = resolveCountExpr(bpeMerges, unigramPieces, byteBpeMerges)
    val baseStats = baseOrder
      .agg(count(lit(1)).as("n"), coalesce(sum("n_tok"), lit(0L)).as("t"))
      .head()
    val nBase = baseStats.getLong(0)
    val tBase = baseStats.getLong(1)
    val toks = batch.select(col(idCol).as("doc_id"),
      countExpr(col(textCol)).cast("long").as("n_tok"))
    val order = Corpus.seededShuffle(
        toks.select(col("doc_id")), "doc_id", seed)
      .withColumn("train_pos", col("train_pos") + nBase)
    val withTok = order.join(toks, "doc_id")
    val sharded = Corpus.budgetShards(
        withTok, Seq("train_pos"), "n_tok", shardTokens, offset = tBase)
      .select("doc_id", "train_pos", "n_tok", "shard_id")
    // boundary-shard seeding: base rows sharing the first delta pack
    // shard re-enter the cumsum (and are filtered back out by position)
    val boundaryShardStart = (nBase / packShardDocs) * packShardDocs
    val seedRows = baseOrder
      .filter(col("train_pos") >= boundaryShardStart)
      .select(col("train_pos").as("id"), col("n_tok"))
    val bounds = Packing.chunkBoundariesFromCounts(
        seedRows.unionByName(
          withTok.select(col("train_pos").as("id"), col("n_tok"))),
        seqLen, packShardDocs)
      .filter(col("doc_id") >= nBase)
      .withColumnRenamed("shard", "pack_shard")
      .withColumnRenamed("doc_id", "train_pos")
      .join(withTok.select("doc_id", "train_pos"), "train_pos")
      .select("pack_shard", "seq_idx", "doc_id", "start", "len")
    Epoch(sharded, bounds)
  }

  /** The TOKEN-ID payload table for a built epoch — what the training
    * job actually loads: (shard_id, train_pos, doc_id, ids), ids under
    * the SAME trained merges the epoch was budgeted with
    * ([[graft.ops.TextOps.bpeEncodeIds]], deterministic BpeVocab id
    * space). `size(ids)` equals the order table's `n_tok` row for row
    * (spec-asserted) — the counts that cut the shards ARE the lengths
    * of the emitted arrays, so shard byte sizes and boundary offsets
    * hold exactly. Opt-in (ids re-materialize the corpus): emit once
    * per release, not per epoch — the epoch's per-seed tables are the
    * tiny order/boundaries; readers join this payload by doc_id.
    */
  def payload(
      docs: DataFrame, idCol: String, textCol: String,
      e: Epoch, merges: Seq[(String, String)]): DataFrame =
    e.order
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")),
        "doc_id")
      .select(col("shard_id"), col("train_pos"), col("doc_id"),
        TextOps.bpeEncodeIds(col("__t"), merges).as("ids"))

  /** [[payload]]'s twin for the unigram tokenizer (t25/t31): ids under
    * the SAME trained pieces the epoch was budgeted with; `size(ids)`
    * equals `n_tok` row-for-row by the shared Viterbi recurrence.
    */
  def payloadUnigram(
      docs: DataFrame, idCol: String, textCol: String,
      e: Epoch, pieces: Map[String, Double]): DataFrame =
    e.order
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")),
        "doc_id")
      .select(col("shard_id"), col("train_pos"), col("doc_id"),
        TextOps.unigramEncodeIds(col("__t"), pieces).as("ids"))

  /** [[payload]]'s twin for the BYTE-level tokenizer (t32/t33): ids
    * under the SAME trained byte merges the epoch was budgeted with
    * (`byteBpeMerges` in [[build]]); `size(ids)` equals `n_tok`
    * row-for-row by the shared engine, and decode reproduces the exact
    * document bytes — the payload a GPT-style trainer loads for
    * multilingual corpora the alpha-run tokenizer cannot represent.
    */
  def payloadByteBpe(
      docs: DataFrame, idCol: String, textCol: String,
      e: Epoch, merges: Seq[(String, String)]): DataFrame =
    e.order
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")),
        "doc_id")
      .select(col("shard_id"), col("train_pos"), col("doc_id"),
        TextOps.byteBpeEncodeIds(col("__t"), merges).as("ids"))

  /** Per-shard integrity manifest: (shard_id, n_docs, n_tokens,
    * content_md5), where content_md5 hashes the shard's doc ids IN EPOCH
    * ORDER — the checksum a reader (or a post-loss rebuild) verifies a
    * written shard against before training resumes on it. The hash
    * input is position-ordered, so any reorder, drop, or substitution
    * inside a shard changes it; aggregation is per-shard (bounded by
    * docs-per-shard), never global.
    */
  def manifest(e: Epoch): DataFrame =
    e.order
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        md5(concat_ws(",",
          array_sort(collect_list(struct(col("train_pos"), col("doc_id"))))
            .getField("doc_id").cast("array<string>"))).as("content_md5"))

  /** Write both tables + the shard manifest under `outDir/epoch=<seed>/`
    * as parquet.
    */
  def write(e: Epoch, outDir: String, seed: String): Unit = {
    e.order.write.mode("overwrite")
      .parquet(s"$outDir/epoch=$seed/order.parquet")
    e.boundaries.write.mode("overwrite")
      .parquet(s"$outDir/epoch=$seed/boundaries.parquet")
    manifest(e).write.mode("overwrite")
      .parquet(s"$outDir/epoch=$seed/manifest.parquet")
  }
}
