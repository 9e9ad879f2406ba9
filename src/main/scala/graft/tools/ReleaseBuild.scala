package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Dedup, TextOps}

/** Corpus release: raw documents to a training-ready epoch in one call —
  * the capstone composition the single-purpose tools build toward
  * ([[CorpusMaintain]] folds ingest, [[AnnMaintain]] keeps the index,
  * THIS cuts a release):
  *
  *  0. EXTRACT (opt-in) — HTML boilerplate stripping (t26 semantics:
  *     script/style blocks dropped wholly, tags dropped content-kept,
  *     entities decoded) for corpora ingested as raw markup; a pure
  *     scan-stage rewrite ahead of everything.
  *  1. SCRUB — repeated-span boilerplate removal (d17's ExactSubstr
  *     shape); opt-in C4 line cleaning after it (t19 semantics:
  *     line-level keeps + the sentence/lorem-ipsum/brace page gate) for
  *     corpora with real line structure.
  *  2. GATE — language allowlist + quality floor on the CLEAN text
  *     (t01/t02 semantics), evaluated in the rebuild's projection;
  *     opt-in MODEL gate after it (t23 semantics: a trained
  *     [[graft.ops.QualityModel]] logit floor — the fastText/CCNet-style
  *     learned screen above the heuristics, one fused scan-stage
  *     expression against broadcast weights).
  *  3. DEDUP — exact min-id canonical via a window-min over the content
  *     hash (d01 semantics). The gated frame is persisted first:
  *     the dedup ids and the text re-join both read it, instead of
  *     re-deriving the scrub+gate chain per branch (Catalyst has no
  *     cross-branch CSE — the p12 lesson), and only narrow (hash, id)
  *     rows cross the dedup exchange.
  *  4. DECONTAMINATE — drop any document sharing ≥ `minShared` distinct
  *     word-`decontamN`-grams with the eval suite (d12's inverted-index
  *     join; the GPT-3-style standard).
  *  5. BAND — CCNet head/middle/tail by unigram surprisal over the
  *     survivors; keep `keepBands` (t16/p19 semantics).
  *  6. EPOCH — [[EpochBuild.build]] over the kept text: seeded order,
  *     token-budgeted shards, packed boundary masks.
  *
  * `audit` is the release funnel — one row per stage with its surviving
  * doc count — the artifact a release review reads first; `card` rolls
  * the kept corpus up per band. Determinism: every stage is a pure
  * function of (corpus, eval suite, seed, thresholds), so re-cutting a
  * release is byte-identical (spec-asserted via the epoch tables).
  *
  * Scale: text shuffles only where the underlying operator already
  * shuffles it (nowhere — scrub/gates are scan-stage; dedup, overlap,
  * banding, and the epoch all exchange hashes/ids/integers), and each
  * stage's 100 TB shape is the one its oracle-checked query pins.
  */
object ReleaseBuild {

  /** The FROZEN release-series statistics a base cut derives and every
    * delta cut applies unchanged — the CCNet discipline (Wenzek et al.
    * 2020 freeze the Wikipedia-trained KenLM and its perplexity band
    * boundaries for a release series; re-deriving per batch would move
    * every standing document's score and band):
    *
    *  - `hotSpans` (h1, h2): the base corpus's over-`maxSpanDf`
    *    boilerplate windows — delta batches scrub against THIS set.
    *  - `qualityThreshold`: the (possibly PR-curve-calibrated) quality
    *    gate cut.
    *  - `gatedHashes` (content_hash): md5 manifest of every gated
    *    document's clean text — the cross-release dedup boundary
    *    (grows with each delta; the one non-frozen member).
    *  - `refCounts` (token, cnt): the banding LM's unigram table.
    *  - `bandCuts`: one row (c1, c2) — the surprisal terciles.
    *
    * All DataFrame members are lazy plans; deriving stats costs nothing
    * until a delta cut (or a pinned build) evaluates them. Persist them
    * as tables between cuts in production.
    */
  final case class SeriesStats(
      hotSpans: DataFrame,
      qualityThreshold: Double,
      gatedHashes: DataFrame,
      refCounts: DataFrame,
      bandCuts: DataFrame)

  /** A cut release: kept `corpus` (id, text, quality, n_tok, band),
    * per-band `card`, the stage-count `audit` funnel, the epoch
    * tables, the frozen [[SeriesStats]] this cut derived (base cuts)
    * or applied (pinned cuts), and (calibrated cuts only) the
    * calibration report.
    */
  final case class Release(
      corpus: DataFrame,
      card: DataFrame,
      audit: DataFrame,
      epoch: EpochBuild.Epoch,
      stats: SeriesStats,
      calibration: Option[Calibration] = None)

  /** The r9 calibration loop's decision record: t27/t29 measured the
    * metrics for two rounds — this is where a release CUT finally
    * consumes them instead of banding on an unexamined signal.
    *
    *  - `qualityThreshold`: the quality-gate cut chosen from the PR
    *    curve (t29 semantics) — the LOWEST curve threshold whose
    *    precision against the Gopher hard-rule labels reaches
    *    `targetPrecision` (keeps the most documents that still meet the
    *    precision bar); None when no curve point qualifies (the caller's
    *    `minQuality` then stands).
    *  - `thresholdPrecision`: the achieved precision at that cut.
    *  - `bandSignalAuc`: t27's exact tie-aware AUC of the banding
    *    signal (per-doc unigram surprisal) against the same labels,
    *    measured on the banding INPUT population.
    *  - `bandingApplied`: false when the AUC is missing/degenerate or
    *    below `aucFloor` — the release then REFUSES to cut bands on an
    *    anti-correlated signal (the measured synthetic-corpus case:
    *    surprisal AUC 0.28, i.e. inverted) and keeps all bands, with
    *    the refusal visible in the `auc_gate` funnel row.
    */
  final case class Calibration(
      qualityThreshold: Option[Double],
      thresholdPrecision: Option[Double],
      bandSignalAuc: Option[Double],
      bandingApplied: Boolean)

  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      evalDocs: DataFrame,
      seed: String,
      shardTokens: Long,
      seqLen: Int,
      scrubN: Int = 5,
      maxSpanDf: Long = 10L,
      langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5,
      decontamN: Int = 8,
      minShared: Long = 1L,
      keepBands: Seq[String] = Seq("head", "middle"),
      c4MinLineWords: Int = 0,
      c4MinSentences: Int = 3,
      bpeMerges: Option[Seq[(String, String)]] = None,
      byteBpeMerges: Option[Seq[(String, String)]] = None,
      qualityModel: Option[graft.ops.QualityModel.LinearQualityModel] = None,
      minLogit: Double = 0.0,
      langModel: Option[graft.ops.LangIdModel.MulticlassLangModel] = None,
      stripMarkup: Boolean = false,
      calibrate: Boolean = false,
      targetPrecision: Double = 0.9,
      aucFloor: Double = 0.5,
      pinned: Option[SeriesStats] = None): Release = {
    // a pinned build is the delta cut's equality REFERENCE: statistics
    // come from the series base, so re-deriving (calibrating) them here
    // would contradict the pin
    require(!(calibrate && pinned.isDefined),
      "calibrate re-derives statistics; a pinned build applies frozen ones")

    // 1-2. scrub, then (opt-in) C4 line cleaning, then gate on the
    // clean text. `c4MinLineWords > 0` enables the t19 rewrite: lines
    // failing C4's keeps are dropped and pages failing the sentence /
    // lorem-ipsum / brace gate are removed — for corpora with real line
    // structure (the synthetic spec corpus has none, so it defaults off)
    // 0. opt-in markup extraction — one more scan-stage projection
    val extracted =
      if (!stripMarkup) docs.select(col(idCol), col(textCol))
      else docs.select(col(idCol),
        TextOps.stripHtml(col(textCol)).as(textCol))
    val hotSpans = pinned.map(_.hotSpans).getOrElse(
      Dedup.spanHotTable(extracted, textCol, idCol, scrubN, maxSpanDf))
    val clean = Dedup.scrubWithHotSpans(
      extracted, textCol, idCol, n = scrubN, hot = hotSpans)
    val lineClean =
      if (c4MinLineWords <= 0) clean
      else clean
        .select(col(idCol), col(textCol),
          TextOps.c4CleanText(col(textCol), c4MinLineWords).as("__c4"))
        .filter(TextOps.c4DocPass(col(textCol), col("__c4"),
          c4MinSentences))
        .select(col(idCol), col("__c4").as(textCol))
    // 2a (opt-in). CALIBRATE the quality threshold from the PR curve of
    // the quality score against the Gopher hard-rule labels (the t23
    // labeling convention) over the gate's own candidate population —
    // the lowest curve threshold meeting `targetPrecision`. Driver-sized
    // decision (the curve is `points` rows), like every trainer in the
    // family; the pick is a pure function of the corpus, so re-cuts
    // stay deterministic.
    val labelOf = TextOps.gopherPass(col(textCol), 10, 100000, minStops = 1)
      .cast("long")
    val calibratedCut: Option[(Double, Double)] =
      if (!calibrate) None
      else {
        val curve = Corpus.prCurve(
          lineClean.select(
            TextOps.qualityScore(col(textCol)).as("quality"),
            labelOf.as("label")),
          "quality", "label", points = 10)
        curve.filter(col("precision") >= targetPrecision)
          .orderBy(col("threshold"))
          .select("threshold", "precision")
          .collect().headOption
          .map(r => (r.getDouble(0), r.getDouble(1)))
      }
    val effMinQuality = pinned.map(_.qualityThreshold)
      .orElse(calibratedCut.map(_._1)).getOrElse(minQuality)
    val gatedHeur = lineClean.select(col(idCol), col(textCol),
        // lang gate: trained multiclass argmax when a model is supplied
        // (the CCNet fastText stage), marker heuristic otherwise — both
        // stateless scan-stage expressions, so the choice never adds a
        // pass or a shuffle
        langModel.fold(TextOps.langId(col(textCol)))(
          _.predict(col(textCol))).as("lang_pred"),
        TextOps.qualityScore(col(textCol)).as("quality"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("lang_pred").isInCollection(langs) &&
        col("quality") >= effMinQuality)
    // 2b. opt-in trained-model gate (one more scan-stage conjunct —
    // broadcast weights, no extra pass)
    val gated = qualityModel.fold(gatedHeur)(m =>
        gatedHeur.filter(m.logit(col(textCol)) >= minLogit))
      // both the dedup branch and the re-join below read this frame;
      // persist (lineage kept), NOT a lazy localCheckpoint: a
      // GC-pressured ContextCleaner unpersisting truncated-lineage
      // blocks between the two consumer stages crashes the second one
      // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, seen in ScaleProbe r10);
      // a cleaned persisted block just recomputes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. exact dedup: min-id per content hash, narrow exchange
    val wMin = Window.partitionBy("__h")
    val keepIds = gated
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .withColumn("__keep", min(idCol).over(wMin))
      .filter(col(idCol) === col("__keep"))
      .select(col(idCol))
    val deduped = gated.join(keepIds, Seq(idCol))

    // 4. decontaminate vs the eval suite
    val flagged = Dedup.crossNGramOverlap(
        deduped, evalDocs.select(col(idCol), col(textCol)),
        textCol, idCol, n = decontamN, minShared = minShared)
      .select(col("id_a").as(idCol)).distinct()
    val decon = deduped.join(flagged, Seq(idCol), "left_anti")

    // 5. band by surprisal over the survivors (they ARE the reference
    // domain after the language gate) and keep the requested bands.
    // Calibrated cuts first SANITY-CHECK the signal: t27's exact AUC of
    // per-doc surprisal against the hard-rule labels on the banding
    // input — below `aucFloor` (or degenerate) the signal ranks
    // backwards or not at all, and cutting its "tail" band would drop
    // the WRONG documents, so the release refuses to band (bands stay
    // attached for the report; nothing is dropped by stage 5)
    val bandAuc: Option[Double] =
      if (!calibrate) None
      else {
        val scored = Corpus.surprisalPerDoc(decon, idCol, textCol, lit(true))
          .select(col(idCol), col("bits_per_token"))
          .join(decon.select(col(idCol), labelOf.as("label")), Seq(idCol))
        val r = Corpus.exactAuc(scored, "bits_per_token", "label")
          .select("auc").collect()(0)
        if (r.isNullAt(0)) None else Some(r.getDouble(0))
      }
    val bandingApplied = !calibrate || bandAuc.exists(_ >= aucFloor)
    // banding, with its statistics (the reference LM counts and the
    // tercile cuts) either derived here (base/unpinned — exactly
    // Corpus.surprisalBuckets' internals) or applied frozen (pinned)
    val refCnt = pinned.map(_.refCounts)
      .getOrElse(Corpus.tokenCounts(decon, textCol))
    val scoredBand = Corpus
      .surprisalWithCounts(decon, idCol, textCol, refCnt)
      .filter(col("n_tok") > 0)
    val bandCuts = pinned.map(_.bandCuts).getOrElse(
      scoredBand.agg(
        percentile(col("bits_per_token"), lit(1.0 / 3)).as("c1"),
        percentile(col("bits_per_token"), lit(2.0 / 3)).as("c2")))
    val banded = scoredBand.crossJoin(broadcast(bandCuts))
      .select(col(idCol),
        when(col("bits_per_token") <= col("c1"), "head")
          .when(col("bits_per_token") <= col("c2"), "middle")
          .otherwise("tail").as("band"))
    val kept0 = decon.join(banded, Seq(idCol))
    val kept = (if (bandingApplied)
        kept0.filter(col("band").isInCollection(keepBands))
      else kept0)
      .select(col(idCol), col(textCol), col("quality"), col("n_tok"),
        col("band"))

    // 6. epoch over the kept text (trained-tokenizer budgets when the
    // caller supplies merges — the t17 counts, not the t03 heuristic)
    val epoch = EpochBuild.build(
      kept.select(col(idCol), col(textCol)), idCol, textCol,
      seed, shardTokens, seqLen, bpeMerges = bpeMerges,
      byteBpeMerges = byteBpeMerges)

    val card = kept.groupBy("band")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("band")

    def stage(name: String, df: DataFrame, ord: Int) =
      df.agg(count(lit(1)).cast("long").as("n_docs"))
        .select(lit(ord).as("ord"), lit(name).as("stage"), col("n_docs"))
    val auditHead = stage("input", docs, 0)
    val withC4 =
      if (c4MinLineWords <= 0) auditHead
      else auditHead.unionByName(stage("line_cleaned", lineClean, 1))
    val withModel =
      if (qualityModel.isEmpty) withC4.unionByName(stage("gated", gated, 2))
      else withC4.unionByName(stage("gated", gatedHeur, 2))
        .unionByName(stage("model_gated", gated, 3))
    val preRelease = withModel
      .unionByName(stage("deduped", deduped, 4))
      .unionByName(stage("decontaminated", decon, 5))
    // calibrated cuts record the auc gate's decision as a funnel row:
    // n_docs = documents the band filter dropped — 0 when the gate
    // refused banding, so a flat decontaminated→released funnel with a
    // zero auc_gate row reads as "signal failed the floor", not "no tail"
    val withAucGate =
      if (!calibrate) preRelease
      else preRelease.unionByName(stage("auc_gate",
        decon.select(col(idCol))
          .join(kept.select(col(idCol)), Seq(idCol), "left_anti"), 6))
    val audit = withAucGate
      .unionByName(stage("released", kept, 7))
      .orderBy("ord").drop("ord")

    val calibration =
      if (!calibrate) None
      else Some(Calibration(
        calibratedCut.map(_._1), calibratedCut.map(_._2),
        bandAuc, bandingApplied))

    // the series statistics this cut derived (base) or applied (pinned);
    // gatedHashes always reflects THIS cut's full gated population, so a
    // later delta's dedup boundary is the union it needs. Lazy plans —
    // cost nothing unless a delta cut evaluates them.
    val stats = SeriesStats(
      hotSpans = hotSpans,
      qualityThreshold = effMinQuality,
      gatedHashes = gated.select(md5(col(textCol)).as("content_hash"))
        .distinct(),
      refCounts = refCnt,
      bandCuts = bandCuts)

    Release(kept, card, audit, epoch, stats, calibration)
  }

  /** A delta cut's outputs: the full updated `corpus` (standing kept ∪
    * `deltaKept`), the folded per-band `card`, the delta `audit` funnel
    * (batch stage counts + a `standing_reused` row making the
    * reused-vs-recomputed split explicit), and the carried-forward
    * `stats` with the dedup manifest grown by this batch.
    */
  final case class Delta(
      corpus: DataFrame,
      deltaKept: DataFrame,
      card: DataFrame,
      audit: DataFrame,
      stats: SeriesStats)

  /** Cut a release BETWEEN full re-cuts by scoring ONLY a newly
    * admitted batch against the frozen [[SeriesStats]] — the 100 TB
    * cost saver (a full re-cut re-scores the entire corpus; under
    * continuous ingest with [[CorpusMaintain.foldBatch]] the batch is
    * what changed). Every stage is the batch-sized form of the full
    * build's stage:
    *
    *  1. scrub against the FROZEN hot-span table (work = batch window
    *     index ⋈ hot set);
    *  2. gate at the frozen quality threshold (+ the caller's standing
    *     model gate — maintain it with [[CorpusMaintain
    *     .foldQualityModel]]);
    *  3. dedup within-batch (min-id) then against the standing
    *     `gatedHashes` manifest (hash anti-join — no standing text
    *     moves);
    *  4. decontaminate the batch against the eval suite;
    *  5. score with the frozen reference LM counts and band at the
    *     frozen tercile cuts.
    *
    * EXACTNESS: `deltaCut(base, batch).corpus` ≡ `build(corpus ∪ batch,
    * pinned = base.stats).corpus` — bit-identical, spec-asserted —
    * provided batch ids exceed every base-cut input id (monotone ingest
    * ids; checked against the released corpus below, contractually
    * against the full base input), so the full cut's min-id dedup keeps
    * exactly the standing representatives the delta reuses. Epoch
    * materialization has its own delta leg: [[EpochBuild.deltaBuild]]
    * folds `deltaKept` into the standing epoch as append-only shards
    * (standing positions frozen, batch positions after N, shard ids and
    * pack sequences continuing the frozen prefix sums) — ≡ a
    * from-scratch build of the appended corpus, at batch-proportional
    * cost (EpochDeltaSpec / the ScaleProbe epoch-delta case).
    *
    * Scale: nothing here touches standing TEXT — the standing side
    * contributes only its hash manifest, hot-span table, and LM counts
    * (all fixed-width, all bucketable) — so the cut's cost is
    * batch-proportional (ScaleProbe's delta case times this).
    */
  def deltaCut(
      base: Release,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      evalDocs: DataFrame,
      scrubN: Int = 5,
      langs: Seq[String] = Seq("en"),
      decontamN: Int = 8,
      minShared: Long = 1L,
      keepBands: Seq[String] = Seq("head", "middle"),
      c4MinLineWords: Int = 0,
      c4MinSentences: Int = 3,
      qualityModel: Option[graft.ops.QualityModel.LinearQualityModel] = None,
      minLogit: Double = 0.0,
      langModel: Option[graft.ops.LangIdModel.MulticlassLangModel] = None,
      stripMarkup: Boolean = false): Delta = {
    val stats = base.stats
    // monotone-id contract: a batch id at-or-below a standing id would
    // let the full re-cut's min-id dedup pick the BATCH doc where the
    // delta reuses the standing one
    val bounds = base.corpus
      .agg(max(col(idCol).cast("long")).as("mx")).collect()(0)
    val bmin = batch.agg(min(col(idCol).cast("long")).as("mn")).collect()(0)
    if (!bounds.isNullAt(0) && !bmin.isNullAt(0))
      require(bmin.getLong(0) > bounds.getLong(0),
        s"batch ids must exceed standing ids: min batch ${bmin.getLong(0)}" +
          s" <= max standing ${bounds.getLong(0)}")

    // 0-2. extract, scrub (frozen hot set), line-clean, gate (frozen cut)
    val extracted =
      if (!stripMarkup) batch.select(col(idCol), col(textCol))
      else batch.select(col(idCol),
        TextOps.stripHtml(col(textCol)).as(textCol))
    val clean = Dedup.scrubWithHotSpans(
      extracted, textCol, idCol, n = scrubN, hot = stats.hotSpans)
    val lineClean =
      if (c4MinLineWords <= 0) clean
      else clean
        .select(col(idCol), col(textCol),
          TextOps.c4CleanText(col(textCol), c4MinLineWords).as("__c4"))
        .filter(TextOps.c4DocPass(col(textCol), col("__c4"),
          c4MinSentences))
        .select(col(idCol), col("__c4").as(textCol))
    val gatedHeur = lineClean.select(col(idCol), col(textCol),
        // lang gate: trained multiclass argmax when a model is supplied
        // (the CCNet fastText stage), marker heuristic otherwise — both
        // stateless scan-stage expressions, so the choice never adds a
        // pass or a shuffle
        langModel.fold(TextOps.langId(col(textCol)))(
          _.predict(col(textCol))).as("lang_pred"),
        TextOps.qualityScore(col(textCol)).as("quality"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("lang_pred").isInCollection(langs) &&
        col("quality") >= stats.qualityThreshold)
    val gated = qualityModel.fold(gatedHeur)(m =>
        gatedHeur.filter(m.logit(col(textCol)) >= minLogit))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. dedup: min-id within the batch, then drop anything the
    // standing manifest already holds (standing wins by monotone ids)
    val wMin = Window.partitionBy("__h")
    val keepIds = gated
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .withColumn("__keep", min(idCol).over(wMin))
      .filter(col(idCol) === col("__keep"))
      .join(stats.gatedHashes
          .select(col("content_hash").as("__h")),
        Seq("__h"), "left_anti")
      .select(col(idCol))
    val deduped = gated.join(keepIds, Seq(idCol))

    // 4. decontaminate the batch vs the eval suite
    val flagged = Dedup.crossNGramOverlap(
        deduped, evalDocs.select(col(idCol), col(textCol)),
        textCol, idCol, n = decontamN, minShared = minShared)
      .select(col("id_a").as(idCol)).distinct()
    val decon = deduped.join(flagged, Seq(idCol), "left_anti")

    // 5. band at the frozen LM + cuts
    val scoredBand = Corpus
      .surprisalWithCounts(decon, idCol, textCol, stats.refCounts)
      .filter(col("n_tok") > 0)
    val banded = scoredBand.crossJoin(broadcast(stats.bandCuts))
      .select(col(idCol),
        when(col("bits_per_token") <= col("c1"), "head")
          .when(col("bits_per_token") <= col("c2"), "middle")
          .otherwise("tail").as("band"))
    val deltaKept = decon.join(banded, Seq(idCol))
      .filter(col("band").isInCollection(keepBands))
      .select(col(idCol), col(textCol), col("quality"), col("n_tok"),
        col("band"))

    val corpus = base.corpus.unionByName(deltaKept)
    // folded card: base card ⊕ delta card (band sums are associative)
    val card = base.card.unionByName(
        deltaKept.groupBy("band")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens")))
      .groupBy("band")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("band")

    def stage(name: String, df: DataFrame, ord: Int) =
      df.agg(count(lit(1)).cast("long").as("n_docs"))
        .select(lit(ord).as("ord"), lit(name).as("stage"), col("n_docs"))
    val audit = stage("batch_input", batch, 0)
      .unionByName(stage("gated", gated, 1))
      .unionByName(stage("deduped", deduped, 2))
      .unionByName(stage("decontaminated", decon, 3))
      .unionByName(stage("released_delta", deltaKept, 4))
      // the reused-vs-recomputed split: everything above scored ONLY
      // the batch; the standing corpus rode through untouched
      .unionByName(stage("standing_reused", base.corpus, 5))
      .unionByName(stage("released_total", corpus, 6))
      .orderBy("ord").drop("ord")

    Delta(corpus, deltaKept, card, audit,
      stats.copy(gatedHashes = stats.gatedHashes.unionByName(
          gated.select(md5(col(textCol)).as("content_hash")))
        .distinct()))
  }
}
