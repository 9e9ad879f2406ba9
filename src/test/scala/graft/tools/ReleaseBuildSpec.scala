package graft.tools

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** End-to-end semantics of the release cut: every stage drops exactly
  * its prey, the audit funnel reports the counts, and re-cutting the
  * release is deterministic.
  */
class ReleaseBuildSpec extends SparkSpec {
  import spark.implicits._

  private val banner =
    "subscribe to our newsletter for daily updates today"
  private val evalText =
    "the quick brown fox jumps over the lazy dog in the park"

  private def mk(id: Long, body: String, withBanner: Boolean = false) =
    (id, if (withBanner) s"$body $banner" else body)

  // 12 docs: 1-4 carry the banner (span df 4 > maxSpanDf 2 -> scrubbed),
  // 6 repeats 5 exactly (dedup), 7 embeds the eval 12-gram (decontam)
  private val docs = Seq(
    mk(1L, "the cat sat on the mat and watched the quiet garden grow",
      withBanner = true),
    mk(2L, "a dog ran through the field and found a bone to keep",
      withBanner = true),
    mk(3L, "the ship sailed into the harbor before the storm arrived",
      withBanner = true),
    mk(4L, "some birds fly south in the winter to find warm weather",
      withBanner = true),
    mk(5L, "the baker made bread and sold it in the market square"),
    mk(6L, "the baker made bread and sold it in the market square"),
    mk(7L, s"my essay begins here $evalText and then concludes with thanks"),
    mk(8L, "rivers carve valleys over time and carry stones to the sea"),
    mk(9L, "the library keeps old maps and letters in a cool dry room"),
    mk(10L, "engineers test the bridge for load and wind every season"),
    mk(11L, "a garden needs sun and water and patient hands to thrive"),
    mk(12L, "the train left the station on time despite the heavy snow"))
    .toDF("doc_id", "text")

  private val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")

  private def cut(): ReleaseBuild.Release = ReleaseBuild.build(
    docs, "doc_id", "text", evalDocs,
    seed = "rel0", shardTokens = 40L, seqLen = 16,
    scrubN = 5, maxSpanDf = 2L,
    langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
    decontamN = 8, minShared = 1L)

  test("c4 stage: junk lines rewritten away, failing pages dropped, " +
    "funnel records the stage") {
    val c4docs = Seq(
      (1L, "the cat sat on the mat today.\n" +
        "please enable javascript to continue reading now.\n" +
        "the dog slept in the warm sun all day.\n" +
        "birds sang in the garden this fine morning."),
      (2L, "short line\nno punctuation here at all"),
      (3L, "function f() { return 1; }\n" +
        "the code page shows brace content here today."))
      .toDF("doc_id", "text")
    val r = ReleaseBuild.build(
      c4docs, "doc_id", "text", evalDocs,
      seed = "rel1", shardTokens = 40L, seqLen = 16,
      scrubN = 5, maxSpanDf = 2L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
      decontamN = 8, minShared = 1L,
      c4MinLineWords = 5, c4MinSentences = 3)
    val audit = r.audit.collect().map(x => x.getString(0) -> x.getLong(1))
    // doc 2 rebuilds empty (< 3 sentences), doc 3 trips the brace gate;
    // doc 1 survives with its javascript line removed
    assert(audit.toSeq.contains("line_cleaned" -> 1L))
    val kept = r.corpus.collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L))
    assert(kept.head.getString(1) ==
      "the cat sat on the mat today.\n" +
        "the dog slept in the warm sun all day.\n" +
        "birds sang in the garden this fine morning.")
  }

  test("funnel: each stage drops exactly its prey, audit records it") {
    val r = cut()
    val audit = r.audit.collect().map(x => x.getString(0) -> x.getLong(1))
    assert(audit.map(_._1).toSeq ==
      Seq("input", "gated", "deduped", "decontaminated", "released"))
    val counts = audit.toMap
    assert(counts("input") == 12L)
    assert(counts("gated") == 12L)          // all langs allowed, floor 0
    assert(counts("deduped") == 11L)        // doc 6 = exact dup of 5
    assert(counts("decontaminated") == 10L) // doc 7 shares an eval 8-gram
    assert(counts("released") < 10L)        // the tail band is cut
    assert(counts("released") >= 1L)

    val ids = r.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(6L) && !ids.contains(7L))
    // the scrub removed the banner spans from every released text
    val texts = r.corpus.select("text").collect().map(_.getString(0))
    assert(texts.forall(!_.contains("newsletter")))
    // bands restricted to the kept set
    val bands = r.corpus.select("band").distinct()
      .collect().map(_.getString(0)).toSet
    assert(bands.subsetOf(Set("head", "middle")))
    // card totals match the released corpus
    val cardDocs = r.card.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .collect()(0).getLong(0)
    assert(cardDocs == counts("released"))
  }

  test("re-cutting the release is deterministic (epoch tables equal)") {
    val a = cut()
    val b = cut()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(a.epoch.order) == rows(b.epoch.order))
    assert(rows(a.epoch.boundaries) == rows(b.epoch.boundaries))
    assert(rows(a.corpus) == rows(b.corpus))
  }

  test("model gate: a trained classifier stage drops what it was taught " +
    "to drop, funnel records both gate counts") {
    // teach the model that consonant-mash docs are low quality
    val labeled = (docs.collect().map(r => (r.getLong(0), r.getString(1), 1.0))
      .toSeq ++ (0 until 8).map(i =>
        (100L + i, s"zzqx$i vvkj qqrp xxzt wwfg kkbn jjdm ppzv", 0.0)))
      .toDF("doc_id", "text", "label")
    val m = graft.ops.QualityModel.train(labeled, "text", "label",
      dim = 512, iters = 60)
    val withJunk = docs.unionByName(
      Seq((200L, "vvkj qqrp xxzt wwfg kkbn jjdm ppzv zzqx9"))
        .toDF("doc_id", "text"))
    val r = ReleaseBuild.build(
      withJunk, "doc_id", "text", evalDocs,
      seed = "rel2", shardTokens = 40L, seqLen = 16,
      scrubN = 5, maxSpanDf = 2L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
      decontamN = 8, minShared = 1L,
      qualityModel = Some(m), minLogit = 0.0)
    val audit = r.audit.collect().map(x => x.getString(0) -> x.getLong(1))
    assert(audit.map(_._1).toSeq == Seq("input", "gated", "model_gated",
      "deduped", "decontaminated", "released"))
    val counts = audit.toMap
    assert(counts("input") == 13L)
    assert(counts("gated") == 13L)       // heuristic floor 0 keeps all
    assert(counts("model_gated") == 12L) // the classifier drops the junk
    assert(!r.corpus.collect().map(_.getLong(0)).contains(200L))
  }

  private val junkDocs = (0 until 6).map(i =>
    (300L + i, s"zzqx$i vvkj qqrp xxzt wwfg kkbn jjdm ppzv"))

  test("calibrated cut: quality threshold comes from the PR curve and " +
    "drops what the hard-rule labels call junk, despite minQuality=0") {
    // junk docs: 8 words < Gopher's 10-word floor -> label 0; their
    // quality score (~0.35) sits below every labeled-good doc's, so some
    // curve percentile separates them at precision 1.0
    val withJunk = docs.unionByName(junkDocs.toDF("doc_id", "text"))
    val r = ReleaseBuild.build(
      withJunk, "doc_id", "text", evalDocs,
      seed = "rel4", shardTokens = 40L, seqLen = 16,
      scrubN = 5, maxSpanDf = 2L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
      decontamN = 8, minShared = 1L,
      calibrate = true, targetPrecision = 0.9)
    val cal = r.calibration.get
    assert(cal.qualityThreshold.isDefined,
      "no curve point reached the precision target")
    assert(cal.thresholdPrecision.get >= 0.9)
    val audit = r.audit.collect().map(x => x.getString(0) -> x.getLong(1))
    assert(audit.map(_._1).toSeq == Seq("input", "gated", "deduped",
      "decontaminated", "auc_gate", "released"))
    val counts = audit.toMap
    assert(counts("input") == 18L)
    assert(counts("gated") == 12L, s"calibrated gate kept ${counts("gated")}")
    val ids = r.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ < 300L))
    // with every junk doc gated out, the banding population is all
    // label-1 -> AUC degenerate -> the release REFUSES to band: nothing
    // dropped at stage 5, auc_gate records 0, all bands released
    assert(cal.bandSignalAuc.isEmpty && !cal.bandingApplied)
    assert(counts("auc_gate") == 0L)
    assert(counts("released") == counts("decontaminated"))
  }

  test("calibrated cut: banding applies only when the signal's AUC " +
    "clears the floor; the auc_gate row records the dropped count") {
    // unreachable precision target -> no curve pick -> minQuality=0
    // keeps the junk -> banding population has BOTH labels -> real AUC;
    // floor 0 admits any measured value, so banding applies
    val withJunk = docs.unionByName(junkDocs.toDF("doc_id", "text"))
    val r = ReleaseBuild.build(
      withJunk, "doc_id", "text", evalDocs,
      seed = "rel5", shardTokens = 40L, seqLen = 16,
      scrubN = 5, maxSpanDf = 2L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
      decontamN = 8, minShared = 1L,
      calibrate = true, targetPrecision = 1.01, aucFloor = 0.0)
    val cal = r.calibration.get
    assert(cal.qualityThreshold.isEmpty)
    assert(cal.bandSignalAuc.isDefined && cal.bandingApplied)
    val counts = r.audit.collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts("auc_gate") ==
      counts("decontaminated") - counts("released"))
    // and with the default floor 0.5 the same inverted-ish tiny-corpus
    // signal is evaluated against the bar the verdict asked for: the
    // decision is recorded either way, never silent
    val bands = r.corpus.select("band").distinct()
      .collect().map(_.getString(0)).toSet
    assert(bands.subsetOf(Set("head", "middle")))
  }

  // the delta batch exercises every stage against the FROZEN stats:
  // 401/402 carry the base-hot banner (scrubbed via the frozen hot set),
  // 405 duplicates standing doc 5's text (manifest dedup), 406/407
  // duplicate each other (within-batch min-id), 408 embeds the eval
  // 8-gram (decontaminated), 403/404 are clean keepers
  private val deltaBatch = Seq(
    mk(401L, "morning fog settled over the bay and hid the fishing boats",
      withBanner = true),
    mk(402L, "the old clock in the hall chimed nine times this evening",
      withBanner = true),
    mk(403L, "fresh snow covered the mountain trail before the hikers came"),
    mk(404L, "the orchestra tuned their strings before the concert began"),
    mk(405L, "the baker made bread and sold it in the market square"),
    mk(406L, "wind turbines turned slowly above the yellow autumn fields"),
    mk(407L, "wind turbines turned slowly above the yellow autumn fields"),
    mk(408L, s"notes start now $evalText and end with a short footer"))
    .toDF("doc_id", "text")

  test("delta cut == pinned full re-cut (corpus and card bit-identical); " +
    "the funnel reports reused vs recomputed") {
    val base = cut()
    val full = ReleaseBuild.build(
      docs.unionByName(deltaBatch), "doc_id", "text", evalDocs,
      seed = "rel0", shardTokens = 40L, seqLen = 16,
      scrubN = 5, maxSpanDf = 2L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
      decontamN = 8, minShared = 1L,
      pinned = Some(base.stats))
    val delta = ReleaseBuild.deltaCut(
      base, deltaBatch, "doc_id", "text", evalDocs,
      scrubN = 5, langs = Seq("en", "de", "fr", "es", "zh"),
      decontamN = 8, minShared = 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(delta.corpus) == rows(full.corpus))
    assert(rows(delta.card) == rows(full.card))
    // the delta actually processed the batch: dup-of-standing and the
    // contaminated doc are gone, exactly one of the within-batch twins
    // survives, and scrubbed keepers carry no banner text
    val deltaIds = delta.deltaKept.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(!deltaIds.contains(405L) && !deltaIds.contains(408L))
    assert(!(deltaIds.contains(406L) && deltaIds.contains(407L)))
    val texts = delta.deltaKept.select("text").collect().map(_.getString(0))
    assert(texts.forall(!_.contains("newsletter")))
    // funnel: reused standing rows + released delta = released total
    val audit = delta.audit.collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(audit("batch_input") == 8L)
    assert(audit("standing_reused") == base.corpus.count())
    assert(audit("released_total") ==
      audit("standing_reused") + audit("released_delta"))
  }

  test("pin-consistency: re-building the base corpus pinned to its own " +
    "stats reproduces the base release exactly") {
    val base = cut()
    val repinned = ReleaseBuild.build(
      docs, "doc_id", "text", evalDocs,
      seed = "rel0", shardTokens = 40L, seqLen = 16,
      scrubN = 5, maxSpanDf = 2L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
      decontamN = 8, minShared = 1L,
      pinned = Some(base.stats))
    assert(base.corpus.collect().map(_.toSeq).toSet ==
      repinned.corpus.collect().map(_.toSeq).toSet)
  }

  test("chained deltas: the second delta dedups against the first's " +
    "grown manifest and still matches the pinned full re-cut") {
    val base = cut()
    val d1 = ReleaseBuild.deltaCut(
      base, deltaBatch, "doc_id", "text", evalDocs,
      scrubN = 5, langs = Seq("en", "de", "fr", "es", "zh"),
      decontamN = 8, minShared = 1L)
    // 501 duplicates a FIRST-DELTA doc's text; 502 is a fresh keeper
    val batch2 = Seq(
      mk(501L, "fresh snow covered the mountain trail before the hikers came"),
      mk(502L, "lanterns lined the river path during the autumn festival"))
      .toDF("doc_id", "text")
    val r1 = ReleaseBuild.Release(
      d1.corpus, d1.card, d1.audit, base.epoch, d1.stats)
    val d2 = ReleaseBuild.deltaCut(
      r1, batch2, "doc_id", "text", evalDocs,
      scrubN = 5, langs = Seq("en", "de", "fr", "es", "zh"),
      decontamN = 8, minShared = 1L)
    val full = ReleaseBuild.build(
      docs.unionByName(deltaBatch).unionByName(batch2),
      "doc_id", "text", evalDocs,
      seed = "rel0", shardTokens = 40L, seqLen = 16,
      scrubN = 5, maxSpanDf = 2L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
      decontamN = 8, minShared = 1L,
      pinned = Some(base.stats))
    assert(d2.corpus.collect().map(_.toSeq).toSet ==
      full.corpus.collect().map(_.toSeq).toSet)
    val ids2 = d2.deltaKept.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(!ids2.contains(501L), "dup of a first-delta doc must not re-admit")
  }

  test("delta cut: non-monotone batch ids fail fast (the min-id dedup " +
    "contract)") {
    val base = cut()
    val bad = Seq(mk(3L, "this id collides with a standing document here"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      ReleaseBuild.deltaCut(
        base, bad, "doc_id", "text", evalDocs,
        scrubN = 5, langs = Seq("en", "de", "fr", "es", "zh"),
        decontamN = 8, minShared = 1L)
    }
    assert(e.getMessage.contains("exceed"))
  }

  test("markup extraction: raw html pages release their extracted text") {
    val pages = docs.collect().map { r =>
      (r.getLong(0), "<html><body><p>" + r.getString(1) +
        "</p><script>track();</script></body></html>")
    }.toSeq.toDF("doc_id", "text")
    val r = ReleaseBuild.build(
      pages, "doc_id", "text", evalDocs,
      seed = "rel3", shardTokens = 40L, seqLen = 16,
      scrubN = 5, maxSpanDf = 2L,
      langs = Seq("en", "de", "fr", "es", "zh"), minQuality = 0.0,
      decontamN = 8, minShared = 1L, stripMarkup = true)
    val texts = r.corpus.select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach { t =>
      assert(!t.contains("<") && !t.contains("track()"), t)
    }
    // same released ids as the plain-text cut (extraction recovers the
    // original bodies, so every later stage sees identical input)
    val plain = cut().corpus.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val got = r.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == plain)
  }
}
