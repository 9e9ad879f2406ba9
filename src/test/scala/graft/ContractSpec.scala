package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guards between the three contract surfaces: SparkEntry.queries
  * (what runs), SparkEntry.oracleSql (what the driver verifies), and
  * SURVEY.md §2 (what the judge checks line by line).
  *
  * r4 lesson: q23 shipped broken precisely because nothing forced a
  * SURVEY row + correctness entry for a new query — this spec makes that
  * gap a compile-adjacent test failure instead of a round-end surprise.
  */
class ContractSpec extends AnyFunSuite {

  private lazy val surveyText: String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)

  test("every SparkEntry.queries key has a SURVEY §2 row naming it") {
    // §2 rows reference their queries key in backticks
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(k => surveyText.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"queries with no SURVEY §2 row: ${missing.mkString(", ")}")
  }

  test("every SURVEY-referenced queries key actually exists") {
    // catch rows pointing at renamed/removed queries: scan backticked
    // tokens that look like queries keys (prefix_digits_...)
    val keyLike = """`([a-z]\d{2}[a-z0-9_]*)`""".r
    val referenced = keyLike.findAllMatchIn(surveyText).map(_.group(1)).toSet
    val unknown = referenced -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"SURVEY references unknown queries keys: ${unknown.mkString(", ")}")
  }

  test("every oracle key is a queries key (driver would skip orphans)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  test("rows-only queries are the documented exceptions, not silent gaps") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // each rows-only query must be justified by a spec gate (RecallSpec /
    // PackSpec / MultimodalSpec / ...) — keep this list deliberate: adding
    // a query without an oracle requires touching it
    val known = Set(
      "d03_dedup_minhash", "d04_dedup_simhash", "d10_dedup_semantic",
      "s02_knn_lsh", "s03_knn_ivf", "s04_kmeans", "s05_knn_pq",
      "s06_knn_ivfpq", "s09_hard_negatives_ivf", "s10_knn_sq8",
      "s11_knn_ivf_sq8",
      "m01_multimodal_meta", "m02_frame_sample",
      "m03_audio_chunks", "m04_phash_pairs", "m05_visual_dedup",
      "p03_pack_greedy",
      // DuckDB cannot BPE-encode; BpeFidelitySpec gates strict equality
      // against an independent reference trainer + encoder
      "t17_bpe_token_count",
      // DuckDB has no deflate; TextOpsSpec pins the expression against
      // a direct java.util.zip reference
      "t18_compression_ratio",
      // trained-float logits (driver-fit logistic model); QualitySpec
      // gates accuracy, reproducibility, and scorer parity
      "t23_model_quality",
      // DuckDB cannot Viterbi-segment; UnigramSpec gates EM monotonicity,
      // Viterbi ≡ brute force, determinism, and the parquet round-trip
      "t25_unigram_token_count",
      // arrays of trained BPE ids have no SQL mirror; TextOpsSpec gates
      // the id round-trip and size ≡ BpeCountExpr
      "t30_bpe_token_ids",
      // same for unigram ids; UnigramSpec gates round-trip and
      // size ≡ UnigramCountExpr (shared Viterbi recurrence)
      "t31_unigram_token_ids",
      // byte-level BPE count + emit; ByteBpeSpec gates trainer/encoder
      // strict equality vs an independent reference, total round-trip,
      // zero-OOV id range, and count ≡ size(ids)
      "t32_byte_bpe_count", "t33_byte_bpe_ids",
      // WordPiece count + emit; WordPieceSpec gates greedy longest
      // match, the whole-word [UNK] rule, the likelihood-gain trainer,
      // decode round-trip, totality, and count ≡ size(ids)
      "t40_wordpiece_ids",
      // s13's IVF scale twin: trained lists have no SQL mirror;
      // RecallSpec gates the fused top-10 vs the exact s13 fusion
      "s14_hybrid_rrf_ivf",
      // A-ES weighted draw: libm ln ulp could flip near-equal key ORDER
      // between engines; CorpusOpsSpec gates strict equality vs a
      // driver-side reference + frequency-tracks-weight across seeds
      "p25_weighted_sample",
      // fertility compares the four TRAINED tokenizers (no SQL mirror
      // for any of them); CorpusOpsSpec gates word-count exactness,
      // the >= 1 lower bounds, and determinism
      "t43_fertility",
      // trained-float multiclass argmax (driver-fit softmax model);
      // LangIdSpec gates planted-population accuracy, reproducibility,
      // save/load, and expression ≡ reference-predictor equality
      "t49_trained_lang_id",
      // GK rank-sketch estimates depend on the compaction schedule (no
      // SQL mirror); SketchSpec gates the ε-rank guarantee vs exact
      // order statistics, merge invariance, and the streaming twin
      "t55_rank_sketch",
      // IVF tuning sweep rides trained centroids (no SQL mirror);
      // RecallSpec gates monotone recall and ~1.0 at the full sweep
      "s22_ivf_tuning",
      // list-balance audit rides the same trained centroids; RecallSpec
      // gates corpus conservation, sane imbalance, finite residuals
      "s23_ivf_balance",
      // re-index migration audit rides two trained centroid sets;
      // VectorOpsSpec gates conservation, [0,1] fractions, and zero
      // migration under identical models
      "s24_centroid_migration",
      // Porter stemmer is an algorithm with no SQL mirror; StemSpec
      // gates the paper's example vectors + codegen/engine parity
      "t63_stem_vocab",
      // DataSketches HLL estimates have no SQL mirror; SketchSpec gates
      // estimate-vs-exact tolerance and shard-union invariance
      "t64_sketch_vocab",
      // silhouette rides trained/fixed centroids (no SQL mirror);
      // VectorOpsSpec gates planted separation, range, conservation
      "s25_silhouette",
      // the MinHash estimate rides the engine's fixed permutation
      // constants (no SQL mirror); DedupSpec gates the exact-dup
      // decile at 1.0 and the binomial error envelope. Oracle upgrade
      // attempted r14 and impossible beyond that one decile: every
      // other bucket's est_jaccard is a function of the 128 seeded
      // (a, b) affine constants, which DuckDB cannot reproduce without
      // re-implementing the signature — the t04 fold trick does not
      // apply (the estimator, not the hash, is engine-private)
      "d40_minhash_calibration",
      // filtered-IVF results ride trained centroids (no SQL mirror);
      // RecallSpec gates recall vs the exact filtered baseline AND
      // that no result escapes the predicate
      "s26_knn_filtered_ivf")
    assert(rowsOnly == known,
      s"unexpected rows-only: ${rowsOnly -- known}; stale: ${known -- rowsOnly}")
  }

  test("SURVEY §2 row ids are unique (coverage table keys on them)") {
    // r10 verdict: 32bf7 and 32bi each numbered two different rows, which
    // breaks the mechanical join the judge does over §2 row ids
    val rowId = """(?m)^\| ([0-9][0-9a-z]*) \|""".r
    val ids = rowId.findAllMatchIn(surveyText).map(_.group(1)).toSeq
    val dups = ids.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate SURVEY §2 row ids: ${dups.mkString(", ")}")
  }

  test("SURVEY §7 tally line matches the artifacts (r8 drift lesson)") {
    val tally = """TALLY queries=(\d+) oracle=(\d+) rows_only=(\d+)""".r
    val m = tally.findFirstMatchIn(surveyText)
      .getOrElse(fail("SURVEY §7 is missing the TALLY line"))
    val (q, o) = (SparkEntry.queries.size, SparkEntry.oracleSql.size)
    assert(m.group(1).toInt == q && m.group(2).toInt == o &&
      m.group(3).toInt == q - o,
      s"SURVEY TALLY says ${m.matched}; artifacts say " +
        s"queries=$q oracle=$o rows_only=${q - o}")
  }
}
