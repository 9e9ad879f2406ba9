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
  *     hash (d01 semantics). The gated frame is localCheckpointed first:
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

  /** A cut release: kept `corpus` (id, text, quality, n_tok, band),
    * per-band `card`, the stage-count `audit` funnel, the epoch
    * tables, and (calibrated cuts only) the calibration report.
    */
  final case class Release(
      corpus: DataFrame,
      card: DataFrame,
      audit: DataFrame,
      epoch: EpochBuild.Epoch,
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
      stripMarkup: Boolean = false,
      calibrate: Boolean = false,
      targetPrecision: Double = 0.9,
      aucFloor: Double = 0.5): Release = {

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
    val clean = Dedup.scrubRepeatedSpans(
      extracted, textCol, idCol,
      n = scrubN, maxSpanDf = maxSpanDf)
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
    val effMinQuality = calibratedCut.map(_._1).getOrElse(minQuality)
    val gatedHeur = lineClean.select(col(idCol), col(textCol),
        TextOps.langId(col(textCol)).as("lang_pred"),
        TextOps.qualityScore(col(textCol)).as("quality"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("lang_pred").isInCollection(langs) &&
        col("quality") >= effMinQuality)
    // 2b. opt-in trained-model gate (one more scan-stage conjunct —
    // broadcast weights, no extra pass)
    val gated = qualityModel.fold(gatedHeur)(m =>
        gatedHeur.filter(m.logit(col(textCol)) >= minLogit))
      // both the dedup branch and the re-join below read this frame;
      // lazy: the first action materializes it
      .localCheckpoint(eager = false)

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
    val banded = Corpus.surprisalBuckets(decon, idCol, textCol, lit(true))
      .select(col(idCol), col("bucket").as("band"))
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

    Release(kept, card, audit, epoch, calibration)
  }
}
