package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.VectorOps

/** Incremental ANN index maintenance (r8): a standing IVF index folds
  * newly admitted vectors assign-only, retrains only on measured drift,
  * and serves queries from the materialized lists with no per-query
  * assignment. Real sf0.01 embeddings; fixed seeds → exact regression
  * gates.
  */
class AnnMaintainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def rows(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("probe_id", "corpus_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("knnIvfPreAssigned: row-identical to knnIvf under the same model") {
    val model = VectorOps.trainIvfModel(emb, "vec_id", "embedding", 32)
    val probes = emb.filter(col("vec_id") < 8)
    val inline = rows(VectorOps.knnIvf(probes, emb, "vec_id", "embedding",
      k = 10, nCentroids = 32, nProbe = 8, model = Some(model)))
    val assigned = VectorOps.assignLists(emb, "vec_id", "embedding", model)
    val pre = rows(VectorOps.knnIvfPreAssigned(probes, assigned,
      "vec_id", "embedding", k = 10, model, nProbe = 8))
    assert(pre == inline && pre.nonEmpty)
    // batch mode is the same physical switch as knnIvf's
    val preB = rows(VectorOps.knnIvfPreAssigned(probes, assigned,
      "vec_id", "embedding", k = 10, model, nProbe = 8,
      broadcastProbes = false))
    assert(preB == inline)
  }

  test("sq8 fold: in-range batch appends code-valid; shifted batch " +
    "retrains with widened ranges; standing queries match knnSq8") {
    import spark.implicits._
    val standing = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val s0 = AnnMaintain.buildSq8(standing, "vec_id", "embedding")
    // in-distribution batch: same generator slice — clamp frac tiny
    val f1 = AnnMaintain.foldSq8(s0, batch, "vec_id", "embedding")
    assert(!f1.retrained, s"clampFrac=${f1.clampFrac}")
    assert(f1.clampFrac <= 0.05)
    assert(f1.state.nVectors == emb.count())
    // queries on the folded standing table = knnSq8 with the same model
    val probes = emb.filter(col("vec_id") < 8)
    val viaState = topkSet(VectorOps.knnSq8PreEncoded(probes,
      f1.state.encoded, "vec_id", "embedding", f1.state.model,
      k = 10, refine = 128))
    val direct = topkSet(VectorOps.knnSq8(probes, emb, "vec_id",
      "embedding", k = 10, refine = 128, model = Some(f1.state.model)))
    assert(viaState == direct && viaState.nonEmpty)
    // out-of-distribution batch: vectors far outside the trained ranges
    val shifted = (100000L until 100050L)
      .map(i => (i, Array.fill(64)(5.0f + (i % 7) * 0.5f)))
      .toDF("vec_id", "embedding")
    val f2 = AnnMaintain.foldSq8(f1.state, shifted, "vec_id", "embedding")
    assert(f2.retrained && f2.clampFrac > 0.05)
    // the retrained ranges now cover the shifted batch: folding it
    // again clamps (near) nothing
    val f3 = AnnMaintain.foldSq8(f2.state, shifted, "vec_id", "embedding")
    assert(!f3.retrained && f3.clampFrac <= 0.001)
  }

  test("append fold: no retrain in-distribution; recall within gate of full retrain") {
    // standing corpus = 80% of the table, batch = the rest — both draws
    // of the same distribution, so the residual ratio must stay under
    // the threshold and the fold must be assign-only
    val standing = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val s0 = AnnMaintain.build(standing, "vec_id", "embedding", 32)
    assert(s0.meanResid > 0.0 && s0.nVectors == standing.count())
    val f = AnnMaintain.fold(s0, batch, "vec_id", "embedding")
    info(f"append-fold drift ratio = ${f.driftRatio}%.3f")
    assert(!f.retrained, s"in-distribution batch triggered retrain: ${f.driftRatio}")
    assert(f.state.nVectors == emb.count())
    assert(f.state.assigned.count() == emb.count())
    // the folded index serves the full corpus: recall vs the exact brute
    // baseline, gated against the same query on a FULLY RETRAINED index —
    // assign-only folding may cost a little recall (batch vectors sit in
    // lists trained without them), bounded here
    val probes = emb.filter(col("vec_id") < 8)
    val brute = topkSet(VectorOps.knnBrute(probes, emb,
      "vec_id", "embedding", k = 10))
    val folded = topkSet(VectorOps.knnIvfPreAssigned(probes,
      f.state.assigned, "vec_id", "embedding", k = 10, f.state.model))
    val retrainState = AnnMaintain.build(emb, "vec_id", "embedding", 32)
    val retrained = topkSet(VectorOps.knnIvfPreAssigned(probes,
      retrainState.assigned, "vec_id", "embedding", k = 10,
      retrainState.model))
    val rFold = (brute & folded).size.toDouble / brute.size
    val rFull = (brute & retrained).size.toDouble / brute.size
    info(f"folded recall = $rFold%.3f, full-retrain recall = $rFull%.3f")
    assert(rFold >= rFull - 0.10,
      f"folded index lost too much vs retrain: $rFold%.3f vs $rFull%.3f")
    assert(rFold >= 0.70, f"folded recall floor: $rFold%.3f")
  }

  test("drift fold: an out-of-distribution batch triggers retrain and re-coverage") {
    import spark.implicits._
    // the drift stat lives in the CLUSTERED regime (the one real
    // embedding corpora occupy — it is why IVF works at all; the sf0.01
    // table is quasi-random, where mean resid is already near 1 and no
    // shift can double it): crafted blobs, deterministic jitter
    val dim = 16
    def jit(i: Int, j: Int): Float =
      (((i * 31 + j * 17) % 13) - 6) * 0.01f
    def blob(center: Int => Float, ids: Range): Seq[(Long, Seq[Float])] =
      ids.map(i => (i.toLong, Seq.tabulate(dim)(j => center(j) + jit(i, j))))
    // three tight blobs along axes 0/1/2
    val standing = (blob(j => if (j == 0) 1f else 0f, 0 until 100) ++
      blob(j => if (j == 1) 1f else 0f, 100 until 200) ++
      blob(j => if (j == 2) 1f else 0f, 200 until 300))
      .toDF("vec_id", "embedding")
    val s0 = AnnMaintain.build(standing, "vec_id", "embedding", 8)
    info(f"blob baseline meanResid = ${s0.meanResid}%.4f")
    // in-distribution batch: more draws from the same blobs — append-only
    val same = blob(j => if (j == 0) 1f else 0f, 1000 until 1050)
      .toDF("vec_id", "embedding")
    val fSame = AnnMaintain.fold(s0, same, "vec_id", "embedding")
    info(f"in-blob fold ratio = ${fSame.driftRatio}%.3f")
    assert(!fSame.retrained)
    // drift batch: a NEW blob on axis 7 — orthogonal to every trained
    // centroid, so its residual is ~1 against a tiny baseline
    val shifted = blob(j => if (j == 7) 1f else 0f, 2000 until 2100)
      .toDF("vec_id", "embedding")
    val f = AnnMaintain.fold(s0, shifted, "vec_id", "embedding")
    info(f"drift-fold ratio = ${f.driftRatio}%.3f")
    assert(f.retrained, s"shifted blob did not trigger retrain: ${f.driftRatio}")
    assert(f.state.assigned.count() == 400)
    // after retrain the new region is covered: residual of the shifted
    // rows under the NEW model must collapse vs under the old one
    val oldResid = VectorOps.assignLists(shifted, "vec_id", "embedding",
      s0.model).agg(avg("resid")).head().getDouble(0)
    val newResid = VectorOps.assignLists(shifted, "vec_id", "embedding",
      f.state.model).agg(avg("resid")).head().getDouble(0)
    info(f"shifted-batch resid: old=$oldResid%.4f new=$newResid%.4f")
    assert(newResid < oldResid / 2,
      f"retrain did not re-cover the shifted region: $newResid%.4f")
  }

  test("knnIvfPqPreEncoded: row-identical to knnIvfPq under the same " +
    "model; pq fold appends encode-only in-distribution, recall gated") {
    val standing = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val s0 = AnnMaintain.buildPq(standing, "vec_id", "embedding", 32)
    assert(s0.meanResid > 0.0 && s0.nVectors == standing.count())
    // pre-encoded query path = inline knnIvfPq under the same model
    val probes = emb.filter(col("vec_id") < 8)
    val inline = rows(VectorOps.knnIvfPq(probes, standing, "vec_id",
      "embedding", k = 10, nCentroids = 32, model = Some(s0.model)))
    val pre = rows(VectorOps.knnIvfPqPreEncoded(probes, s0.encoded,
      "vec_id", "embedding", s0.model, k = 10))
    assert(pre == inline && pre.nonEmpty)
    // in-distribution fold: encode-only append, codes stay model-valid
    val f = AnnMaintain.foldPq(s0, batch, "vec_id", "embedding")
    info(f"pq append-fold drift ratio = ${f.driftRatio}%.3f")
    assert(!f.retrained, s"in-distribution batch retrained: ${f.driftRatio}")
    assert(f.state.nVectors == emb.count())
    assert(f.state.encoded.count() == emb.count())
    // folded standing index recall vs brute, gated against full retrain
    val brute = topkSet(VectorOps.knnBrute(probes, emb,
      "vec_id", "embedding", k = 10))
    val folded = topkSet(VectorOps.knnIvfPqPreEncoded(probes,
      f.state.encoded, "vec_id", "embedding", f.state.model, k = 10))
    val full = AnnMaintain.buildPq(emb, "vec_id", "embedding", 32)
    val retrained = topkSet(VectorOps.knnIvfPqPreEncoded(probes,
      full.encoded, "vec_id", "embedding", full.model, k = 10))
    val rFold = (brute & folded).size.toDouble / brute.size
    val rFull = (brute & retrained).size.toDouble / brute.size
    info(f"pq folded recall = $rFold%.3f, full-retrain recall = $rFull%.3f")
    assert(rFold >= rFull - 0.10,
      f"pq fold lost too much vs retrain: $rFold%.3f vs $rFull%.3f")
    assert(rFold >= 0.60, f"pq folded recall floor: $rFold%.3f")
  }

  test("pq drift fold: an out-of-distribution blob retrains centroids " +
    "AND codebooks and re-covers the new region") {
    import spark.implicits._
    val dim = 16
    def jit(i: Int, j: Int): Float =
      (((i * 31 + j * 17) % 13) - 6) * 0.01f
    def blob(center: Int => Float, ids: Range): Seq[(Long, Seq[Float])] =
      ids.map(i => (i.toLong, Seq.tabulate(dim)(j => center(j) + jit(i, j))))
    val standing = (blob(j => if (j == 0) 1f else 0f, 0 until 100) ++
      blob(j => if (j == 1) 1f else 0f, 100 until 200) ++
      blob(j => if (j == 2) 1f else 0f, 200 until 300))
      .toDF("vec_id", "embedding")
    val s0 = AnnMaintain.buildPq(standing, "vec_id", "embedding",
      nCentroids = 8, m = 4, codebookSize = 16)
    val shifted = blob(j => if (j == 7) 1f else 0f, 2000 until 2100)
      .toDF("vec_id", "embedding")
    val f = AnnMaintain.foldPq(s0, shifted, "vec_id", "embedding",
      nCentroids = 8, codebookSize = 16)
    info(f"pq drift-fold ratio = ${f.driftRatio}%.3f")
    assert(f.retrained, s"shifted blob did not trigger retrain: ${f.driftRatio}")
    assert(f.state.encoded.count() == 400)
    assert(f.state.model.m == s0.model.m) // geometry survives retrain
    // the retrained model covers the new blob: its rows' residuals
    // collapse vs under the old model
    val oldResid = VectorOps.encodeIvfPq(shifted, "vec_id", "embedding",
      s0.model).agg(avg("resid")).head().getDouble(0)
    val newResid = VectorOps.encodeIvfPq(shifted, "vec_id", "embedding",
      f.state.model).agg(avg("resid")).head().getDouble(0)
    info(f"pq shifted-batch resid: old=$oldResid%.4f new=$newResid%.4f")
    assert(newResid < oldResid / 2,
      f"pq retrain did not re-cover the shifted region: $newResid%.4f")
    // a same-blob re-fold under the retrained model appends quietly
    val again = blob(j => if (j == 7) 1f else 0f, 3000 until 3020)
      .toDF("vec_id", "embedding")
    val f2 = AnnMaintain.foldPq(f.state, again, "vec_id", "embedding",
      nCentroids = 8, codebookSize = 16)
    assert(!f2.retrained)
  }

  test("state parquet roundtrip: model, lists, and baseline survive") {
    val s0 = AnnMaintain.build(emb.filter(col("vec_id") < 200),
      "vec_id", "embedding", 16)
    val path = java.nio.file.Files.createTempDirectory("annm").toString + "/idx"
    s0.save(spark, path)
    val loaded = AnnMaintain.AnnState.load(spark, path)
    assert(loaded.meanResid == s0.meanResid && loaded.nVectors == s0.nVectors)
    assert(loaded.model.centroids.zip(s0.model.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    val probes = emb.filter(col("vec_id") < 4)
    assert(rows(VectorOps.knnIvfPreAssigned(probes, loaded.assigned,
      "vec_id", "embedding", k = 5, loaded.model)) ==
      rows(VectorOps.knnIvfPreAssigned(probes, s0.assigned,
        "vec_id", "embedding", k = 5, s0.model)))
  }
}
