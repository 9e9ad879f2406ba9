package graft

import org.apache.spark.sql.DataFrame

import graft.ops.Dedup

/** Recall gates for the approximate (rows-only) queries: each one is
  * bounded against its exact counterpart on real test data, so "no DuckDB
  * oracle" never means "unverified". All inputs and operators are
  * deterministic (fixed seeds / hash-derived randomness), so these are
  * exact regression gates, not flaky statistical tests.
  *
  * Measured values at sf0.01 when the gates were locked in (update the
  * assertion floors deliberately if parameters change):
  *  - d03 minHashLsh = exact n-gram Jaccard pair set, zero misses
  *  - d02 with maxGramDf=25 (prunes 77% of the inverted index) = uncapped
  *  - s02 knnLsh recall@10 vs brute force (see assertion)
  *  - s03/s05/s06 recall@10 vs brute force — r6 Lloyd-trained centroids
  *    and codebooks: s03 0.450→0.838, s05 0.913→0.963, s06 0.450→0.838
  *  - d10 semanticDedup drop recall 0.981 with nAssign=3 (0.472/0.755
  *    with nAssign=1/2 — curve printed by the test)
  */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d03: LSH banding finds EXACTLY the exact-jaccard pair set (sf0.01)") {
    val exact = pairSet(SparkEntry.queries("d02_dedup_jaccard")(spark, dir))
    val lsh = pairSet(SparkEntry.queries("d03_dedup_minhash")(spark, dir))
    assert(exact.nonEmpty)
    assert(lsh == exact,
      s"missed=${(exact -- lsh).size} spurious=${(lsh -- exact).size}")
  }

  test("d02: active df-cap (capped candidates + exact verify) loses nothing (sf0.01)") {
    val docs = Tables.load(spark, dir, "documents")
    val uncapped = Dedup.nGramJaccard(docs, "text", "doc_id", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // maxGramDf=25 drops ~77% of the inverted index at this SF (max df 46),
    // so the cap is genuinely exercised, and every surviving jaccard value
    // must still be exact
    val capped = Dedup.nGramJaccard(docs, "text", "doc_id", 1, 2, maxGramDf = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uncapped.nonEmpty)
    assert(capped == uncapped,
      s"missed=${(uncapped -- capped).size} spurious=${(capped -- uncapped).size}")
  }

  test("d06: crossJaccard active df-cap loses nothing (sf0.01)") {
    // r7: the cross-relation twin of d02's cap — combined-df pruning of
    // candidate generation + exact re-verify; same zero-loss bar on real
    // data with the cap genuinely active
    val docs = Tables.load(spark, dir, "documents")
    val left = docs.filter("doc_id < 250")
    val right = docs.filter("doc_id >= 250")
    def pairs(cap: Int) =
      Dedup.crossJaccard(left, right, "text", "doc_id", 1, 2, maxGramDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = pairs(Int.MaxValue)
    val capped = pairs(25)
    assert(uncapped.nonEmpty)
    assert(capped == uncapped,
      s"missed=${(uncapped -- capped).size} spurious=${(capped -- uncapped).size}")
  }

  test("s02: knnLsh multi-probe recall@10 vs brute force (sf0.01)") {
    val brute = topkSet(SparkEntry.queries("s01_knn_brute")(spark, dir))
    val lsh = topkSet(SparkEntry.queries("s02_knn_lsh")(spark, dir))
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"s02 recall@10 = $recall%.3f (${(brute & lsh).size}/${brute.size})")
    assert(recall >= 0.50, f"recall regressed: $recall%.3f < 0.50")
  }

  test("s22: ivfTuningCurve — recall monotone non-decreasing in nProbe, " +
    "full sweep recovers ~all of brute force, counts consistent (sf0.01)") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val curve = graft.ops.VectorOps.ivfTuningCurve(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8), emb,
        "vec_id", "embedding", k = 10, nCentroids = 32,
        probeSweep = Seq(1, 4, 8, 32))
      .orderBy("n_probe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(curve.map(_._1).toSeq == Seq(1L, 4L, 8L, 32L))
    assert(curve.forall(_._3 == curve.head._3), "shared ground truth")
    val recalls = curve.map(_._4)
    recalls.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, s"recall must not decrease with nProbe: $recalls")
    }
    println(s"[recall] s22 curve: ${curve.mkString(", ")}")
    assert(recalls.head < recalls.last,
      "the sweep must actually show the knob doing something")
    assert(recalls.last >= 0.95,
      s"probing every list ~is the brute scan: ${recalls.last}")
  }

  test("s23: ivfBalanceAudit — occupancy conserves the corpus, imbalance " +
    "= nLists*max/N >= 1 and sane, residuals finite in [0, 2] (sf0.01)") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val rows = graft.ops.VectorOps.ivfBalanceAudit(
        emb, "vec_id", "embedding", nCentroids = 32)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._2).sum == n, "every vector lands in one list")
    assert(rows.map(_._4).sum > 0.999 && rows.map(_._4).sum < 1.001)
    val imb = rows.head._5
    assert(rows.forall(_._5 == imb), "one shared imbalance factor")
    assert(imb >= 1.0 && imb < 32.0, s"imbalance $imb")
    rows.foreach { case (_, _, resid, _, _) =>
      assert(!resid.isNaN && resid >= 0.0 && resid <= 2.0)
    }
    println(f"[recall] s23 imbalance=$imb%.2f maxList=${rows.map(_._2).max}")
  }

  test("s03: knnIvf recall@10 vs brute force (sf0.01)") {
    val brute = topkSet(SparkEntry.queries("s01_knn_brute")(spark, dir))
    val ivf = topkSet(SparkEntry.queries("s03_knn_ivf")(spark, dir))
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"s03 recall@10 = $recall%.3f (${(brute & ivf).size}/${brute.size})")
    // r6: Lloyd-trained list centroids lifted 0.450 -> 0.838
    assert(recall >= 0.70, f"recall regressed: $recall%.3f < 0.70")
  }

  test("s14: IVF-dense hybrid fusion recall@10 vs the exact s13 fusion " +
    "(sf0.01)") {
    def fusedSet(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir)
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = fusedSet("s13_hybrid_rrf")
    val ivf = fusedSet("s14_hybrid_rrf_ivf")
    assert(exact.nonEmpty)
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"s14 fused recall@10 = $recall%.3f")
    // the sparse half is identical in both, so fusion damps dense-side
    // IVF misses — the fused floor sits above the raw s03 dense floor
    assert(recall >= 0.80, f"fused recall $recall%.3f < 0.80")
  }

  test("IvfModel: parquet roundtrip; a pre-trained model equals inline") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val m = graft.ops.VectorOps.trainIvfModel(emb, "vec_id", "embedding",
      nCentroids = 32)
    val path = java.nio.file.Files.createTempDirectory("ivfm").toString + "/m"
    m.save(spark, path)
    val loaded = graft.ops.VectorOps.IvfModel.load(spark, path)
    // byte-exact roundtrip: doubles survive parquet untouched
    assert(loaded.centroids.length == m.centroids.length)
    assert(loaded.centroids.zip(m.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    // an index-build-job model reproduces the inline-trained rows exactly
    def run(mm: Option[graft.ops.VectorOps.IvfModel]) =
      topkSet(graft.ops.VectorOps.knnIvf(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", k = 10, nCentroids = 32, nProbe = 8,
        model = mm))
    assert(run(Some(loaded)) == run(None))
  }

  test("IvfPqModel: parquet roundtrip; a pre-trained model equals inline") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val m = graft.ops.VectorOps.trainIvfPqModel(emb, "vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivfpqm").toString + "/m"
    m.save(spark, path)
    val loaded = graft.ops.VectorOps.IvfPqModel.load(spark, path)
    assert(loaded.rawCentroids.zip(m.rawCentroids)
      .forall { case (a, b) => a.sameElements(b) })
    assert(loaded.codebooks.length == m.codebooks.length)
    assert(loaded.codebooks.zip(m.codebooks).forall { case (a, b) =>
      a.length == b.length &&
        a.zip(b).forall { case (x, y) => x.sameElements(y) }
    })
    def run(mm: Option[graft.ops.VectorOps.IvfPqModel]) =
      topkSet(graft.ops.VectorOps.knnIvfPq(emb.filter(col("vec_id") < 8),
        emb, "vec_id", "embedding", k = 10, model = mm))
    assert(run(Some(loaded)) == run(None))
  }

  test("Sq8Model: parquet roundtrip; a pre-trained model equals inline") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val m = graft.ops.VectorOps.trainSq8Model(emb, "vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("sq8m").toString + "/m"
    m.save(spark, path)
    val loaded = graft.ops.VectorOps.Sq8Model.load(spark, path)
    assert(loaded.mins.sameElements(m.mins))
    assert(loaded.deltas.sameElements(m.deltas))
    def run(mm: Option[graft.ops.VectorOps.Sq8Model]) =
      topkSet(graft.ops.VectorOps.knnSq8(emb.filter(col("vec_id") < 8),
        emb, "vec_id", "embedding", k = 10, refine = 128, model = mm))
    assert(run(Some(loaded)) == run(None))
  }

  test("s07: filtered knnIvf recall@10 vs the filtered exact baseline (sf0.01)") {
    import org.apache.spark.sql.functions.col
    // shared full-corpus index, label predicate filters the list scan;
    // precision must be exact (every hit satisfies the predicate — it is
    // applied corpus-side before scoring), recall gated vs s07's oracle-
    // checked brute force. nProbe=20 (vs s03's 8): the predicate thins
    // each list's matching density ~5x, so the filtered top-10 sits
    // deeper in centroid order and holding recall needs a wider probe
    // (measured r7: 0.600 at nProbe=12, 0.688 at 16, 0.850 at 20)
    val emb = Tables.load(spark, dir, "embeddings")
    val brute = topkSet(SparkEntry.queries("s07_knn_filtered")(spark, dir))
    val ivf = graft.ops.VectorOps.knnIvf(emb.filter(col("vec_id") < 8), emb,
      "vec_id", "embedding", k = 10, nCentroids = 32, nProbe = 20,
      corpusFilter = col("label") === 2)
    val ivfSet = topkSet(ivf)
    val validIds = emb.filter(col("label") === 2).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ivfSet.forall(p => validIds(p._2)),
      "filtered IVF returned a corpus id outside the predicate")
    val recall = (brute & ivfSet).size.toDouble / brute.size
    info(f"s07 recall@10 = $recall%.3f (${(brute & ivfSet).size}/${brute.size})")
    assert(recall >= 0.70, f"recall regressed: $recall%.3f < 0.70")
  }

  test("s07b: filtered knnIvfPq recall@10 vs the filtered exact baseline (sf0.01)") {
    import org.apache.spark.sql.functions.col
    // the composed-ladder twin of the s07 gate: same shared full-corpus
    // models, label predicate filters assignment+encode; candidates are
    // PQ-scored within the probed lists then exactly re-ranked
    val emb = Tables.load(spark, dir, "embeddings")
    val brute = topkSet(SparkEntry.queries("s07_knn_filtered")(spark, dir))
    val ivfpq = graft.ops.VectorOps.knnIvfPq(emb.filter(col("vec_id") < 8),
      emb, "vec_id", "embedding", k = 10, nCentroids = 32, nProbe = 20,
      m = 8, codebookSize = 32, refine = 128,
      corpusFilter = col("label") === 2)
    val got = topkSet(ivfpq)
    val validIds = emb.filter(col("label") === 2).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.forall(p => validIds(p._2)),
      "filtered IVFPQ returned a corpus id outside the predicate")
    val recall = (brute & got).size.toDouble / brute.size
    info(f"s07b recall@10 = $recall%.3f (${(brute & got).size}/${brute.size})")
    assert(recall >= 0.70, f"recall regressed: $recall%.3f < 0.70")
  }

  test("s09: hardNegativesIvf recall@10 vs the exact cartesian s08 (sf0.01)") {
    import org.apache.spark.sql.functions.col
    // r8: the bounded hard-negative path — precision must be exact (every
    // returned pair's labels differ; the inequality is applied corpus-
    // side inside the list join), recall gated vs the oracle-checked
    // exact baseline
    val emb = Tables.load(spark, dir, "embeddings")
    val exact = topkSet(SparkEntry.queries("s08_hard_negatives")(spark, dir))
    val got = SparkEntry.queries("s09_hard_negatives_ivf")(spark, dir)
    val gotSet = topkSet(got)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotSet.forall { case (p, c) => labels(p) != labels(c) },
      "hard-negative result contains a same-label pair")
    val recall = (exact & gotSet).size.toDouble / exact.size
    info(f"s09 recall@10 = $recall%.3f (${(exact & gotSet).size}/${exact.size})")
    assert(recall >= 0.70, f"recall regressed: $recall%.3f < 0.70")
  }

  test("s09b: hardNegatives label filter threads through knnIvfPq too") {
    import org.apache.spark.sql.functions.col
    // the composed-ladder twin: same inequality applied before the
    // refine-set selection, so re-ranked candidates are label-valid
    val emb = Tables.load(spark, dir, "embeddings")
    val exact = topkSet(SparkEntry.queries("s08_hard_negatives")(spark, dir))
    val got = topkSet(graft.ops.VectorOps.knnIvfPq(
      emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", k = 10,
      nCentroids = 32, nProbe = 12, m = 8, codebookSize = 32, refine = 128,
      excludeLabelCol = Some("label")))
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall { case (p, c) => labels(p) != labels(c) },
      "IVFPQ hard-negative result contains a same-label pair")
    val recall = (exact & got).size.toDouble / exact.size
    info(f"s09b recall@10 = $recall%.3f (${(exact & got).size}/${exact.size})")
    assert(recall >= 0.70, f"recall regressed: $recall%.3f < 0.70")
  }

  test("d21: IVF-bounded semantic decontamination vs the exact baseline (sf0.01)") {
    import org.apache.spark.sql.functions.col
    // the bounded twin inverts the roles: probes = train (large, batch
    // mode), corpus = eval (small), k = 1, tau filter after. Twin hits
    // are exact cosines of real pairs, so precision is 1 by construction
    // (flagged ⊆ exact) — assert it; recall gated
    val emb = Tables.load(spark, dir, "embeddings")
    val train = emb.filter(col("vec_id") % 10 =!= 0)
    val evalDf = emb.filter(col("vec_id") % 10 === 0)
    val exact = SparkEntry.queries("d21_semantic_decontaminate")(spark, dir)
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty)
    val twin = graft.ops.VectorOps.knnIvf(train, evalDf,
        "vec_id", "embedding", k = 1, nCentroids = 8, nProbe = 4,
        broadcastProbes = false)
      .filter(col("cos") >= 0.4)
      .select("probe_id").collect().map(_.getLong(0)).toSet
    assert((twin -- exact).isEmpty, s"twin flagged clean rows: ${twin -- exact}")
    val recall = (exact & twin).size.toDouble / exact.size
    info(f"d21 twin recall = $recall%.3f (${(exact & twin).size}/${exact.size})")
    assert(recall >= 0.70, f"recall regressed: $recall%.3f < 0.70")
  }

  test("IvfPqModel: a mismatched m or residual flag is rejected, not mis-scored") {
    import org.apache.spark.sql.functions.col
    // r8 (ADVICE): the meta parquet persists the residual flag; knnIvfPq
    // must refuse a model whose geometry disagrees with the call instead
    // of silently mis-slicing subvectors / mis-scoring ADC
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val m = graft.ops.VectorOps.trainIvfPqModel(emb, "vec_id", "embedding",
      m = 8, residual = true)
    assert(m.m == 8 && m.residual)
    val path = java.nio.file.Files.createTempDirectory("ivfpqmm").toString + "/m"
    m.save(spark, path)
    val loaded = graft.ops.VectorOps.IvfPqModel.load(spark, path)
    assert(loaded.residual, "residual flag lost in the parquet roundtrip")
    def run(mOpt: Int, res: Boolean) =
      graft.ops.VectorOps.knnIvfPq(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", k = 10, m = mOpt, residual = res,
        model = Some(loaded))
    intercept[IllegalArgumentException] { run(4, res = true) }
    intercept[IllegalArgumentException] { run(8, res = false) }
    assert(run(8, res = true).count() > 0)
  }

  test("s05: knnPq ADC+refine recall@10 vs brute force (sf0.01)") {
    val brute = topkSet(SparkEntry.queries("s01_knn_brute")(spark, dir))
    val pq = topkSet(SparkEntry.queries("s05_knn_pq")(spark, dir))
    val recall = (brute & pq).size.toDouble / brute.size
    info(f"s05 recall@10 = $recall%.3f (${(brute & pq).size}/${brute.size})")
    // r6: per-subspace Lloyd-trained codebooks lifted 0.913 -> 0.963
    assert(recall >= 0.90, f"recall regressed: $recall%.3f < 0.90")
  }

  test("s10: knnSq8 per-dim byte codes recall@10 vs brute force (sf0.01)") {
    val brute = topkSet(SparkEntry.queries("s01_knn_brute")(spark, dir))
    val sq8 = topkSet(SparkEntry.queries("s10_knn_sq8")(spark, dir))
    val recall = (brute & sq8).size.toDouble / brute.size
    info(f"s10 recall@10 = $recall%.3f (${(brute & sq8).size}/${brute.size})")
    // per-dim error is bounded by delta/2 (no codeword collapse), so the
    // SQ8 approximation should rank at least as well as PQ's s05 gate
    assert(recall >= 0.90, f"recall regressed: $recall%.3f < 0.90")
  }

  test("s11: knnIvfSq8 composed recall@10 vs brute force (sf0.01)") {
    val brute = topkSet(SparkEntry.queries("s01_knn_brute")(spark, dir))
    val got = topkSet(SparkEntry.queries("s11_knn_ivf_sq8")(spark, dir))
    val recall = (brute & got).size.toDouble / brute.size
    info(f"s11 recall@10 = $recall%.3f (${(brute & got).size}/${brute.size})")
    // bounded above by the IVF list recall (s03's gate); the SQ8 stage
    // is near-lossless within lists (s10 measured 1.000 standalone)
    assert(recall >= 0.70, f"recall regressed: $recall%.3f < 0.70")
  }

  test("s06: knnIvfPq composed recall@10 vs brute force (sf0.01)") {
    val brute = topkSet(SparkEntry.queries("s01_knn_brute")(spark, dir))
    val ivfpq = topkSet(SparkEntry.queries("s06_knn_ivfpq")(spark, dir))
    val recall = (brute & ivfpq).size.toDouble / brute.size
    info(f"s06 recall@10 = $recall%.3f (${(brute & ivfpq).size}/${brute.size})")
    // bounded above by the IVF list recall (s03's gate): candidates are
    // restricted to the probed lists before ADC ever sees them
    // (r6 trained centroids+codebooks: 0.450 -> 0.838 = s03's recall,
    // i.e. the PQ stage is still lossless within the probed lists)
    assert(recall >= 0.70, f"recall regressed: $recall%.3f < 0.70")
  }

  test("batch mode (shuffled list join) returns exactly the query-mode rows") {
    // r6: broadcastProbes=false is a physical-plan switch for large probe
    // relations — same lists, same scores, same tie-breaks, so the result
    // must be row-identical to query mode, including ranks
    val emb = Tables.load(spark, dir, "embeddings")
    val probes = emb.filter("vec_id % 71 = 0")
    def rows(df: DataFrame): Set[(Long, Long, Int)] =
      df.select("probe_id", "corpus_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivfQ = rows(graft.ops.VectorOps.knnIvf(
      probes, emb, "vec_id", "embedding", k = 10))
    val ivfB = rows(graft.ops.VectorOps.knnIvf(
      probes, emb, "vec_id", "embedding", k = 10, broadcastProbes = false))
    assert(ivfQ == ivfB && ivfQ.nonEmpty)
    val ivfpqQ = rows(graft.ops.VectorOps.knnIvfPq(
      probes, emb, "vec_id", "embedding", k = 10))
    val ivfpqB = rows(graft.ops.VectorOps.knnIvfPq(
      probes, emb, "vec_id", "embedding", k = 10, broadcastProbes = false))
    assert(ivfpqQ == ivfpqB && ivfpqQ.nonEmpty)
    // r7: knnLsh grew the same physical switch
    val lshQ = rows(graft.ops.VectorOps.knnLsh(
      probes, emb, "vec_id", "embedding", k = 10))
    val lshB = rows(graft.ops.VectorOps.knnLsh(
      probes, emb, "vec_id", "embedding", k = 10, broadcastProbes = false))
    assert(lshQ == lshB && lshQ.nonEmpty)
  }

  test("s06: residual encoding beats raw shared codebooks at small refine") {
    // r7: residual=true PQ-codes v − c_list, so at equal codebook size the
    // ADC approximation is tighter. The effect is invisible at the shipped
    // refine=128 (both reach the IVF list bound — candidates are confined
    // to the probed lists regardless of encoding); a SMALL refine stresses
    // ADC fidelity, where the tighter cells must not lose MORE of the true
    // top-k than raw coding. nProbe=nCentroids removes the list bound so
    // the measured difference is purely the PQ stage.
    val emb = Tables.load(spark, dir, "embeddings")
    val probes = emb.filter("vec_id < 8") // s01's probe set
    val brute = topkSet(SparkEntry.queries("s01_knn_brute")(spark, dir))
    def recallOf(res: Boolean): Double = {
      val got = topkSet(graft.ops.VectorOps.knnIvfPq(
        probes, emb, "vec_id", "embedding", k = 10,
        nCentroids = 32, nProbe = 32, refine = 12, residual = res))
      (brute & got).size.toDouble / brute.size
    }
    val raw = recallOf(res = false)
    val resid = recallOf(res = true)
    info(f"s06 refine=12 recall: raw=$raw%.3f residual=$resid%.3f")
    // measured at gate-lock (sf0.01): raw 0.413, residual 0.663 — the
    // margin is the point; floors leave slack for parameter drift
    assert(resid >= raw + 0.10,
      f"residual encoding no longer beats raw: $resid%.3f vs $raw%.3f")
    assert(resid >= 0.60, f"residual refine-12 recall too low: $resid%.3f")
  }

  test("d10: semantic-dedup drops ⊆ exact drops, recall gated (sf0.01)") {
    // exact baseline: same greedy min-id policy over the FULL cosine pair
    // set (d05's exact all-pairs at the same tau)
    val exactDrops = pairSet(SparkEntry.queries("d05_dedup_embedding")(spark, dir))
      .map(_._2)
    val semDrops = SparkEntry.queries("d10_dedup_semantic")(spark, dir)
      .filter("keep = 0").collect().map(_.getLong(0)).toSet
    assert(exactDrops.nonEmpty)
    // a within-cluster pair is an exact pair (same arithmetic, same tau),
    // so false drops are impossible — assert it
    assert((semDrops -- exactDrops).isEmpty,
      s"spurious drops: ${semDrops -- exactDrops}")
    // cost/recall curve across the nAssign multi-probe dial (work scales
    // ≤ nAssign² per cluster) — info only; the floor gates the shipped dial
    val emb = Tables.load(spark, dir, "embeddings")
    (1 to 3).foreach { n =>
      val d = graft.ops.VectorOps.semanticDedup(emb, "vec_id", "embedding",
          k = 10, iters = 3, tau = 0.4, nAssign = n)
        .filter("keep = 0").collect().map(_.getLong(0)).toSet
      info(f"d10 nAssign=$n recall = ${(d & exactDrops).size.toDouble / exactDrops.size}%.3f")
    }
    val recall = (semDrops & exactDrops).size.toDouble / exactDrops.size
    info(f"d10 drop recall = $recall%.3f (${(semDrops & exactDrops).size}/${exactDrops.size})")
    assert(recall >= 0.85, f"recall regressed: $recall%.3f < 0.85")
  }

  test("d10: cluster-size cap inactive at sf0.01 (rows identical to uncapped)") {
    val emb = Tables.load(spark, dir, "embeddings")
    def drops(cap: Int): Set[Long] =
      graft.ops.VectorOps.semanticDedup(emb, "vec_id", "embedding",
          k = 10, iters = 3, tau = 0.4, maxClusterSize = cap)
        .filter("keep = 0").collect().map(_.getLong(0)).toSet
    assert(drops(20000) == drops(Int.MaxValue),
      "default cap changed results at test SF")
  }

  test("d10: identical mega-blob drops all but the min id (collapse layer)") {
    import spark.implicits._
    // 300 identical vectors, k=1 -> one cluster of 300; cap=32 keeps the
    // guard active. r6: the exact-vector collapse resolves the whole blob
    // with one hash-groupBy (no pair join rows at all) — exact greedy
    // min-id semantics must still hold: exactly one row kept.
    val n = 300
    val mega = (0 until n).map(i => (i.toLong, Seq.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val res = graft.ops.VectorOps.semanticDedup(mega, "vec_id", "embedding",
        k = 1, iters = 1, tau = 0.9, nAssign = 1, maxClusterSize = 32)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(res.size == n)
    assert(res(0L) == 1, "min id must be kept")
    assert(res.count(_._2 == 0) == n - 1,
      s"expected ${n - 1} drops, got ${res.count(_._2 == 0)}")
  }

  test("d10: active value-band cap loses little on real data (sf0.01)") {
    // r6: cap=24 forces multi-band splits of every cluster (500 rows /
    // k=10 ≈ 50 per cluster × nAssign=2) on DISTINCT vectors — the layer
    // the identical-blob case can't reach. Banded pairs ⊆ unbanded pairs
    // by construction (same cluster, narrower cells), so drops must be a
    // subset; near-dups have near-equal dist2, so recall should stay
    // high (measured 0.925 at gate-lock; floor leaves slack for
    // parameter drift).
    val emb = Tables.load(spark, dir, "embeddings")
    def drops(cap: Int): Set[Long] =
      graft.ops.VectorOps.semanticDedup(emb, "vec_id", "embedding",
          k = 10, iters = 3, tau = 0.4, maxClusterSize = cap)
        .filter("keep = 0").collect().map(_.getLong(0)).toSet
    val unbanded = drops(Int.MaxValue)
    val banded = drops(24)
    assert(unbanded.nonEmpty)
    assert((banded -- unbanded).isEmpty, s"spurious drops: ${banded -- unbanded}")
    val recall = (banded & unbanded).size.toDouble / unbanded.size
    info(f"d10 banded(cap=24) drop recall vs unbanded = $recall%.3f")
    assert(recall >= 0.80, f"banding recall regressed: $recall%.3f < 0.80")
  }

  test("d10: equidistant over-cap cluster falls back to hash bands (width=0)") {
    import spark.implicits._
    // 120 one-hot vectors cycling over 8 axes: all are EQUIDISTANT from
    // any centroid (equal norms, k=1 → one cluster, every dist2 equal →
    // value-band width = 0). The r7 fallback must still split the
    // over-cap cluster by hash bands instead of restoring one quadratic
    // cell; same-axis vectors are byte-identical, so the collapse layer
    // must resolve each axis class to its min id regardless of banding.
    val n = 120
    val distinct = (0 until n).map(i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == i % 8) 1.0f else 0.0f)))
    val dupes = (0 until 40).map(i => ((n + i).toLong,
      Seq.tabulate(8)(j => if (j == 0) 1.0f else 0.0f)))
    val df = (distinct ++ dupes).toDF("vec_id", "embedding")
    val res = graft.ops.VectorOps.semanticDedup(df, "vec_id", "embedding",
        k = 1, iters = 1, tau = 0.99, nAssign = 1, maxClusterSize = 16)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(res.size == n + 40)
    // every vector on axis 0 (ids 0, 8, 16, ... and all 40 dupes) is an
    // exact duplicate class with min id 0 -> only id 0 keeps among them
    val axis0 = (0 until n by 8).map(_.toLong).toSet ++
      (0 until 40).map(i => (n + i).toLong).toSet
    assert(res(0L) == 1)
    assert(axis0.count(id => res(id) == 0) == axis0.size - 1,
      "exact-dup axis-0 class must collapse to min id even at width=0")
  }

  test("s04: k-means distortion is monotone in iterations (sf0.01)") {
    import org.apache.spark.sql.functions.sum
    val emb = graft.Tables.load(spark, dir, "embeddings")
    def distortion(iters: Int): Double =
      graft.ops.VectorOps.kmeansAssign(emb, "vec_id", "embedding", 10, iters)
        .agg(sum("dist2")).head().getDouble(0)
    val d1 = distortion(1)
    val d3 = distortion(3)
    info(f"total dist2: iters=1 $d1%.0f, iters=3 $d3%.0f")
    assert(d3 <= d1 * (1 + 1e-12), "Lloyd's must not increase distortion")
  }

  test("t09: HLL++ vocab within 3x rsd of exact per group (sf0.01)") {
    import graft.{Tables => T}
    val docs = T.load(spark, dir, "documents")
    val exact = graft.ops.Corpus.vocabPerGroup(docs, "text", "lang")
      .select("lang", "vocab").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.ops.Corpus.approxVocabPerGroup(docs, "text", "lang", 0.05)
      .select("lang", "vocab").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (lang, v) =>
      val err = math.abs(approx(lang) - v).toDouble / v
      info(f"$lang: exact=$v approx=${approx(lang)} err=$err%.4f")
      assert(err <= 0.15, f"$lang HLL error $err%.3f exceeds 3x rsd bound")
    }
  }

  test("t06 scale path: CMS heavy hitters bound exact counts from above " +
    "within e*N/width and recover the exact top-k set (sf0.01)") {
    import graft.{Tables => T}
    import org.apache.spark.sql.functions.{col, explode, lit, count}
    val docs = T.load(spark, dir, "documents")
    val k = 20
    val exactTop = graft.ops.Corpus.heavyHitters(docs, "text", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.ops.Corpus.cmsHeavyHitters(docs, "text", k,
        width = 8192, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == k)
    // the zipf head is unambiguous on the probe corpus: sets must match
    assert(got.map(_._1).toSet == exactTop.keySet,
      s"cms set ${got.map(_._1).toSet} != exact ${exactTop.keySet}")
    val totalN = docs
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      .agg(count(lit(1))).collect()(0).getLong(0)
    val eps = math.ceil(math.E * totalN / 8192).toLong
    got.foreach { case (t, est) =>
      val ex = exactTop(t)
      assert(est >= ex, s"CMS underestimated $t: $est < $ex")
      assert(est <= ex + eps, s"CMS over bound for $t: $est > $ex + $eps")
    }
  }
  test("s22 r15b: the one-pass sweep equals the per-point knnIvf " +
    "construction bit-for-bit (sf0.01)") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 6)
    val k = 7; val nC = 16; val sweep = Seq(1, 3, 8, 16)
    val got = graft.ops.VectorOps.ivfTuningCurve(
        probes, emb, "vec_id", "embedding", k, nC, sweep)
      .orderBy("n_probe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent reference: the pre-r15b construction — one knnIvf run
    // per sweep point against the same deterministic model, hits by
    // exact intersection with the brute-force truth
    val truth = graft.ops.VectorOps.knnBrute(
        probes, emb, "vec_id", "embedding", k)
      .select("probe_id", "corpus_id")
    val nT = truth.count()
    val model = graft.ops.VectorOps.trainIvfModel(
      emb, "vec_id", "embedding", nC)
    val want = sweep.map { p =>
      val hits = graft.ops.VectorOps.knnIvf(
          probes, emb, "vec_id", "embedding", k, nC,
          nProbe = p, model = Some(model))
        .select("probe_id", "corpus_id")
        .join(truth, Seq("probe_id", "corpus_id")).count()
      (p.toLong, hits, nT)
    }
    assert(got.toSeq == want, s"one-pass ${got.toSeq} != per-point $want")
  }
}
