package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/** Structured Streaming forms of the corpus operators. The batch twins
  * live in graft.ops.Dedup; the signature and banding projections are
  * SHARED (Dedup.minHashSignaturesRaw / Dedup.bandKeys), so a document
  * hashes to the same band buckets whichever engine sees it.
  */
object CorpusStream {

  /** A band-bucket collision: `id_b` arrived and its band `band` hashed
    * into bucket `bucket` already anchored by `id_a` (the bucket's
    * canonical min id). Candidate pairs, NOT verified duplicates — the
    * streaming analog of [[graft.ops.Dedup.minHashLsh]]'s pre-verify
    * banding join. Downstream either verifies against a standing corpus
    * (stream-static gram join) or feeds incremental CC (d11's fold).
    */
  final case class BandHit(id_a: Long, id_b: Long, band: Int, bucket: Long)

  final case class BucketState(minId: Long)

  /** Streaming near-duplicate candidate generation: MinHash-LSH banding
    * as ONE stateful operator. Each arriving document explodes to its
    * `bands` band keys; per (band, bucket) the state holds only the
    * bucket's canonical MIN id (a single long — not the member list), and
    * emissions link every new arrival to that canonical id, plus a
    * re-link when a smaller id takes over the anchor. Connectivity over
    * the emitted links therefore equals bucket co-membership — the same
    * information the batch banding join produces as all-pairs — while
    * per-bucket emission stays linear in arrivals (the batch side needs
    * its hot-bucket cap precisely because bucket^2 pair rows blow up;
    * the anchor-link formulation never materializes them).
    *
    * State at 100 TB: one (long) per distinct live (band, bucket) key.
    * With `ttlSeconds > 0` (requires `withWatermark` upstream) a bucket
    * idle past the horizon is forgotten — the standing-corpus dedup
    * window production streams actually run, since "near-dup of a
    * document from years ago" is the incremental BATCH pipeline's job
    * (d06/d09/d11), not the hot path's. `ttlSeconds = 0` keeps state
    * forever (bounded-corpus replays, tests).
    */
  def lshCandidateStream(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      bands: Int,
      rowsPerBand: Int,
      ttlSeconds: Long = 0L): Dataset[BandHit] = {
    import docs.sparkSession.implicits._
    val banded = Dedup.bandKeys(
      Dedup.minHashSignaturesRaw(docs, textCol, idCol, bands * rowsPerBand),
      bands, rowsPerBand)
      .as[(Long, Int, Long)]
    val timeout =
      if (ttlSeconds > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[BucketState, BandHit](
        OutputMode.Append, timeout) {
        case ((band, bucket), it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ids = it.map(_._1).toArray.distinct.sorted
            val prior = state.getOption.map(_.minId)
            val anchor = (prior.toSeq ++ ids).min
            state.update(BucketState(anchor))
            if (ttlSeconds > 0L)
              state.setTimeoutDuration(ttlSeconds * 1000L)
            val newIds = ids.filterNot(prior.contains)
            val links = newIds.filter(_ != anchor)
              .map(i => BandHit(anchor, i, band, bucket)) ++
              // a new smaller id displaced the anchor: re-link the old
              // one so connectivity over emissions is preserved
              prior.filter(_ > anchor)
                .map(p => BandHit(anchor, p, band, bucket))
            links.iterator
          }
      }
  }

  /** One cross-corpus ExactSubstr evidence row from the streaming
    * guard: the arriving doc `id` shares a maximal run of `span_len`
    * tokens with standing-corpus doc `corpus_id`, starting at token
    * `start` (stream side) / `corpus_start` (standing side).
    */
  final case class SpanHit(
      id: Long, corpus_id: Long, start: Long, corpus_start: Long,
      span_len: Long)

  /** Streaming ExactSubstr guard (r14): arriving documents checked
    * against a STANDING corpus' frozen shingle index
    * ([[graft.ops.Dedup.substringIndex]], persisted once beside the
    * corpus — the spanHotTable freeze convention), emitting the exact
    * shared spans ≥ `minSpanLen` — live decontamination/memorization
    * screening at ingest, the streaming twin of
    * [[graft.ops.Dedup.crossSubstringSpans]] (CorpusStreamSpec pins
    * batch parity).
    *
    * Hot-window bound (r15): freeze the standing index with
    * `maxWindowDf` — `substringIndex(corpus, …, maxWindowDf)` — and
    * this guard INHERITS the cap: a boilerplate window with corpus df
    * ~10⁸ contributes zero join candidates because it is absent from
    * the frozen side (persist `substringHotWindows` beside the index
    * as the d17/d25 tiering handoff). Per arriving doc the candidate
    * work is then ≤ windows(doc)·cap, never df² (CorpusStreamSpec pins
    * capped-index parity with the equally-capped batch form).
    *
    * Shape: the stream side is a pure scan-stage shingle projection
    * (no per-doc state), the join is stream-static equi on the hash
    * pair, and the diagonal gaps-and-islands chain runs per
    * (doc, corpus doc, diagonal) group inside ONE
    * flatMapGroupsWithState call. A document's match rows all travel
    * in the micro-batch that carries the document, so the group is
    * complete when seen and NO state is ever retained (NoTimeout,
    * state never set — zero standing state at 100 TB; the operator
    * exists for its group-complete iterator, not its store). Re-
    * delivered documents re-emit identical evidence rows
    * (at-least-once; sinks dedup on the natural key).
    */
  def substringGuardStream(
      docs: DataFrame, textCol: String, idCol: String,
      standingIndex: DataFrame, n: Int, minSpanLen: Int)
      : Dataset[SpanHit] = {
    import docs.sparkSession.implicits._
    require(minSpanLen >= n,
      s"minSpanLen=$minSpanLen below window size $n is incomplete")
    val stream = Dedup.spanWindowProjection(
      docs.filter(org.apache.spark.sql.functions.col(textCol).isNotNull),
      textCol, idCol, n)
    val joined = stream.as("s").join(standingIndex.as("c"),
        org.apache.spark.sql.functions.col("s.h1") ===
          org.apache.spark.sql.functions.col("c.h1") &&
        org.apache.spark.sql.functions.col("s.h2") ===
          org.apache.spark.sql.functions.col("c.h2"))
      .selectExpr("s.id AS id", "c.id AS cid", "CAST(s.pos AS INT) AS pa",
        "CAST(c.pos - s.pos AS INT) AS diag")
      .as[(Long, Long, Int, Int)]
    joined
      .groupByKey(r => (r._1, r._2, r._4))
      .flatMapGroupsWithState[Int, SpanHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((id, cid, diag), it, _) =>
          val pos = it.map(_._3).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer[SpanHit]()
          var s0 = pos(0); var prev = pos(0)
          def close(): Unit = {
            val len = prev + n - s0
            if (len >= minSpanLen)
              out += SpanHit(id, cid, s0.toLong, (s0 + diag).toLong,
                len.toLong)
          }
          var i = 1
          while (i < pos.length) {
            val p = pos(i)
            if (p - prev > n) { close(); s0 = p }
            prev = p
            i += 1
          }
          close()
          out.iterator
      }
  }

  /** One admitted document from the streaming paragraph-Bloom guard:
    * `n_paras` normalized paragraphs arrived, `n_kept` were novel
    * against the standing corpus, `text` rejoins the kept ones in
    * order. A doc whose every paragraph is known emits nothing.
    */
  final case class ParaAdmit(
      id: Long, n_paras: Long, n_kept: Long, text: String)

  /** Streaming paragraph-level Bloom dedup — the Dolma "BFF" ingest
    * twin (r15; batch forms graft.ops.Dedup.paragraphDedup /
    * paragraphIncremental): arriving documents drop the paragraphs a
    * STANDING corpus already contains and admit the rest, rejoined in
    * order. The standing side is the frozen paragraph-hash set
    * ([[graft.ops.Dedup.paragraphHashSet]], persisted beside the
    * corpus) plus its Bloom sketch
    * ([[graft.ops.Dedup.paragraphBloom]]).
    *
    * Shape: the stream side is a pure scan-stage paragraph projection;
    * the Bloom probes IN THAT STAGE, so every definite-new paragraph
    * (the bulk of healthy ingest) bypasses the join entirely — only
    * might-contain survivors reach the stream-static left join on the
    * fixed-width md5 key, and false positives resolve there, so
    * admission is EXACT. The per-doc fold is a group-complete
    * flatMapGroupsWithState (a doc's paragraph rows travel in its
    * micro-batch; NoTimeout, state never set — zero standing state,
    * the substringGuardStream discipline). Batch paragraphs dedup
    * against the CORPUS, not each other; fold admitted docs and
    * re-freeze to advance the filter (the CorpusMaintain cycle).
    */
  def paragraphAdmitStream(
      docs: DataFrame, textCol: String, idCol: String,
      standingParas: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter)
      : Dataset[ParaAdmit] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val paras = Dedup.paraProjection(docs, textCol, idCol)
      .select(col("id"), col("pos"), col("para"),
        xxhash64(col("norm")).as("h64"), md5(col("norm")).as("m"))
    val probe = graft.functions.HashExpressions
      .bloomMightContain(col("h64"), bloom)
    val definiteNew = paras.filter(!probe)
      .select(col("id"), col("pos"), col("para"), lit(false).as("is_dup"))
    val maybe = paras.filter(probe)
      .join(standingParas.select(col("m"), lit(1).as("hit")).distinct(),
        Seq("m"), "left")
      .select(col("id"), col("pos"), col("para"),
        col("hit").isNotNull.as("is_dup"))
    definiteNew.unionByName(maybe)
      .as[(Long, Int, String, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Int, ParaAdmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (id, it, _) =>
          val rows = it.toArray.sortBy(_._2)
          val kept = rows.filter(!_._4)
          if (kept.isEmpty) Iterator.empty
          else Iterator.single(ParaAdmit(id, rows.length.toLong,
            kept.length.toLong, kept.map(_._3).mkString("\n")))
      }
  }

  /** Streaming ingest curation — the ADMIT path of the batch curation
    * pipeline (p12 / ReleaseBuild) as one composition, for documents
    * arriving continuously with an ingest timestamp:
    *
    *  1. per-page cleanup (pure maps, scan-stage): within-doc repeated-
    *     line removal (d23) and, when `c4MinLineWords > 0`, C4 line
    *     cleaning + page gate (t19);
    *  2. language allowlist + quality floor on the CLEAN text (t01/t02);
    *  3. exact-content dedup via `dropDuplicatesWithinWatermark` on the
    *     md5 — effectively-once admission, state bounded by the
    *     watermark horizon (the 32h shape keyed on content);
    *  4. surprisal scoring against the STANDING unigram table (t16's
    *     broadcast bit table — stateless).
    *
    * Corpus-GLOBAL stages (span scrub, banding, CC) need the whole
    * corpus and stay batch: this stream is the admission filter that
    * feeds them through [[graft.tools.CorpusMaintain.foldBatch]].
    * Output: (id, ts, clean text, quality, sum_bits, n_tok,
    * bits_per_token) per ADMITTED document, append mode.
    */
  def curateStream(
      docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      counts: DataFrame,
      langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5,
      lateness: String = "1 hour",
      c4MinLineWords: Int = 0,
      maxVocab: Int = 1 << 20,
      qualityModel: Option[graft.ops.QualityModel.LinearQualityModel] = None,
      minLogit: Double = 0.0,
      langModel: Option[graft.ops.LangIdModel.MulticlassLangModel] = None,
      blocklist: Seq[String] = Nil,
      maxBlockedPer1k: Double = 60.0): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.ops.TextOps
    val cleanedText = {
      val deduped = TextOps.dedupDocLines(col(textCol))
      if (c4MinLineWords > 0) TextOps.c4CleanText(deduped, c4MinLineWords)
      else deduped
    }
    val cleaned0 = docs.select(col(idCol), col(tsCol),
      cleanedText.as(textCol), col(textCol).as("__orig"))
    val cleaned =
      if (c4MinLineWords > 0)
        cleaned0.filter(TextOps.c4DocPass(col("__orig"), col(textCol)))
          .drop("__orig")
      else cleaned0.drop("__orig")
    val gatedHeur = cleaned
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      // lang gate: trained multiclass argmax when a model is supplied
      // (the SAME stage ReleaseBuild applies batch-side), marker
      // heuristic otherwise — both stateless, so they stream unchanged
      .filter(langModel.fold(TextOps.langId(col(textCol)))(
          _.predict(col(textCol))).isInCollection(langs) &&
        col("quality") >= minQuality)
    // opt-in trained-model gate — the SAME stage ReleaseBuild applies
    // batch-side (model_gated), here one more stateless scan conjunct
    // against broadcast weights, so admission criteria cannot drift
    // between the stream and the release cut
    val gatedModel = qualityModel.fold(gatedHeur)(m =>
      gatedHeur.filter(m.logit(col(textCol)) >= minLogit))
    // opt-in lexicon blocklist gate — the t59 batch expression verbatim
    // (occurrences per 1k tokens, zero-token docs never NaN-flag), one
    // more stateless scan conjunct so stream and release-cut admission
    // cannot drift
    val gated =
      if (blocklist.isEmpty) gatedModel
      else {
        val toks = TextOps.tokens(col(textCol))
        val nTok = size(toks).cast("long")
        val hits = size(filter(toks, t => t.isInCollection(blocklist)))
          .cast("long")
        val density = when(nTok > 0,
          (hits * 1000L).cast("double") / nTok.cast("double"))
        gatedModel.filter(!coalesce(density >= maxBlockedPer1k, lit(false)))
      }
    val admitted = gated
      .withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
    // scoring is a stateless projection (the surprisalScoreStream shape
    // applied in place so ts/text/quality ride along)
    def bitsOf(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val total = counts.agg(sum("cnt")).collect()(0).getLong(0)
    val top = counts.orderBy(col("cnt").desc, col("token").asc)
      .limit(maxVocab).collect()
      .map(r => r.getString(0) -> bitsOf(total / r.getLong(1))).toMap
    val oov = bitsOf(total)
    admitted
      .withColumn("__s", graft.functions.TextExpressions
        .tokenBits(col(textCol), top, oov))
      .select(col(idCol), col(tsCol), col(textCol), col("quality"),
        coalesce(col("__s.sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("__s.n_tok").cast("long"), lit(0L)).as("n_tok"),
        when(coalesce(col("__s.n_tok"), lit(0)) === 0, lit(null))
          .otherwise(col("__s.sum_bits").cast("double") / col("__s.n_tok"))
          .cast("double").as("bits_per_token"))
  }

  /** Streaming CONDITIONAL-bigram surprisal against standing unigram +
    * bigram tables — [[surprisalScoreStream]]'s twin for
    * [[graft.ops.Corpus.bigramSurprisalPerDoc]]. Both tables' top-
    * `maxVocab` heads ship as broadcast bit tables inside ONE fused
    * scan-stage expression ([[graft.functions.PairBitsExpr]]) —
    * stateless, any output mode, no watermark.
    *
    * Bit values precompute on the driver exactly as the batch join
    * computes them: a standing pair scores
    * `bits(cnt(w1) div cnt(w1 w2))`, a missing pair with a standing
    * context backs off to `bits(cnt(w1))` (hapax), an unseen context
    * scores 1 bit. With both tables uncapped the stream is bit-equal to
    * the batch form (spec-asserted); under a cap, Zipf makes the
    * untracked tails near-backoff, so truncation only moves
    * near-backoff pairs/contexts TO their backoff value. A capped
    * UNIGRAM head also drops the pairs whose context fell out (their
    * exact c1 is unknown); those pairs score the context backoff, which
    * for a tail context is within a bit of the true value.
    */
  def bigramSurprisalScoreStream(
      docs: DataFrame, idCol: String, textCol: String,
      uniCounts: DataFrame, biCounts: DataFrame,
      maxVocab: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    def bitsOf(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val ctxCnt = uniCounts.orderBy(col("cnt").desc, col("w1").asc)
      .limit(maxVocab).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ctxBits = ctxCnt.map { case (w, c) => w -> bitsOf(c) }
    val pairBits = biCounts.orderBy(col("cnt").desc, col("bigram").asc)
      .limit(maxVocab).collect()
      .flatMap { r =>
        val pair = r.getString(0)
        val c2 = r.getLong(1)
        val w1 = pair.substring(0, pair.indexOf(' '))
        // a pair whose context fell out of the capped unigram head is
        // dropped: its exact c1 is unknown, the expression backs off
        ctxCnt.get(w1).map(c1 => pair -> bitsOf(c1 / c2))
      }.toMap
    docs
      .select(col(idCol),
        graft.functions.TextExpressions
          .pairBits(col(textCol), pairBits, ctxBits).as("s"))
      .select(col(idCol),
        coalesce(col("s.sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("s.n_pairs").cast("long"), lit(0L)).as("n_pairs"),
        when(coalesce(col("s.n_pairs"), lit(0)) === 0, lit(null))
          .otherwise(col("s.sum_bits").cast("double") / col("s.n_pairs"))
          .cast("double").as("bits_per_pair"))
  }

  /** Streaming surprisal scoring against a STANDING unigram table (the
    * one [[graft.tools.CorpusMaintain.foldTokenCounts]] maintains): the
    * hot-path twin of [[graft.ops.Corpus.surprisalWithCounts]]. The
    * standing table's top-`maxVocab` head ships to executors as a
    * broadcast bit table inside a fused scan-stage expression
    * ([[graft.functions.TokenBitsExpr]]) — STATELESS, so it runs in any
    * output mode with no watermark, and works identically on a batch
    * frame (spec asserts bit-equality with the join-based batch form
    * when the vocabulary fits the cap).
    *
    * `ref_total` sums the FULL table (not the capped head) so hapax
    * backoff matches the batch form exactly; under Zipf the untracked
    * tail is hapax-like, so capping only moves near-backoff tokens to
    * the backoff value.
    */
  def surprisalScoreStream(
      docs: DataFrame, idCol: String, textCol: String,
      counts: DataFrame, maxVocab: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    def bitsOf(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val total = counts.agg(sum("cnt")).collect()(0).getLong(0)
    val top = counts.orderBy(col("cnt").desc, col("token").asc)
      .limit(maxVocab).collect()
      .map(r => r.getString(0) -> bitsOf(total / r.getLong(1))).toMap
    val oov = bitsOf(total)
    docs
      .select(col(idCol),
        graft.functions.TextExpressions
          .tokenBits(col(textCol), top, oov).as("s"))
      .select(col(idCol),
        coalesce(col("s.sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("s.n_tok").cast("long"), lit(0L)).as("n_tok"),
        when(coalesce(col("s.n_tok"), lit(0)) === 0, lit(null))
          .otherwise(col("s.sum_bits").cast("double") / col("s.n_tok"))
          .cast("double").as("bits_per_token"))
  }

  /** Streaming maintenance of [[graft.ops.Corpus.histQuantiles]]'s bin
    * state: a plain streaming aggregation over (group, bin) — Spark's
    * state store holds ONE count per live (group, bin) cell (the t39
    * claim made operational: bin counts are commutative sums, so
    * micro-batch folds ARE the batch aggregation), and update-mode
    * emissions re-publish only cells a batch touched. Quantiles finish
    * read-side with [[graft.ops.Corpus.quantilesFromBins]] over the
    * sink — a histogram-sized rollup, not a document-sized one.
    * CorpusStreamSpec asserts the streamed cells equal the batch
    * binning and the finished quantiles equal the batch operator,
    * across multiple micro-batches.
    */
  def histBinStream(docs: DataFrame, textCol: String, groupCol: String,
      binWidth: Long = 16L): DataFrame =
    graft.ops.Corpus.binDocs(docs, textCol, groupCol, binWidth)

  /** Streaming maintenance of the count-min sketch
    * ([[graft.ops.Corpus.cmsCells]]): the state store holds ONE count
    * per live (row, bucket) cell — ≤ depth·width rows REGARDLESS of the
    * token stream's vocabulary, which is the whole point: an
    * open-vocabulary live ingest (URLs, ids, n-gram keys) is monitored
    * with FIXED state where an exact streaming top-k would grow its
    * store with every new key. Cell counts are commutative sums, so
    * micro-batch folds ARE the batch sketch; heavy-hitter estimates
    * finish read-side with [[graft.ops.Corpus.cmsEstimateFromCells]]
    * over the sink (a sketch-sized rollup, never a corpus one).
    * CorpusStreamSpec asserts cell parity with the batch sketch across
    * micro-batches and that the finished top-k recovers the exact
    * heavy hitters on the probe corpus.
    */
  def cmsCellStream(docs: DataFrame, textCol: String,
      width: Int = 8192, depth: Int = 4): DataFrame =
    graft.ops.Corpus.cmsCells(docs, textCol, width, depth)

  /** Streaming maintenance of [[graft.ops.Corpus.rankSketchQuantiles]]:
    * `approx_percentile` is a TypedImperativeAggregate, so the state
    * store holds ONE serialized GK `QuantileSummaries` buffer per group
    * (`O((1/ε)·log(εn))` tuples — bounded like the CMS and bin cells,
    * never the value multiset) and each micro-batch MERGES into it —
    * the mergeability that makes the sketch a sketch is exactly what
    * makes its streaming twin a plain streaming aggregation. Update
    * mode re-emits only groups a batch touched; estimates finish
    * in-aggregate (no read-side step needed, unlike the bin cells).
    * SketchSpec asserts the streamed estimates obey the same ε-rank
    * gate as the batch operator across multiple micro-batches.
    */
  def quantileSketchStream(docs: DataFrame, textCol: String,
      groupCol: String, accuracy: Int = 1000): DataFrame =
    graft.ops.Corpus.rankSketchQuantiles(docs, textCol, groupCol, accuracy)
}
