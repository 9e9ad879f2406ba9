package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Standing ANN-index maintenance: fold newly admitted vectors into a
  * trained IVF index WITHOUT retraining per batch — the vector-side
  * companion of [[CorpusMaintain]] (a 100 TB corpus under continuous
  * ingest cannot re-run Lloyd's and re-assign every fold). State is two
  * tables plus two scalars:
  *
  *  - `model` — the [[VectorOps.IvfModel]] centroids (train-once).
  *  - `assigned` — the materialized inverted lists
  *    ([[VectorOps.assignLists]]: corpus_id, cq, cn2, list, resid);
  *    queries run [[VectorOps.knnIvfPreAssigned]] against it directly,
  *    so per-query work is probe-side only.
  *  - `meanResid` — the corpus-mean coverage residual (1 − cos to the
  *    assigned unit centroid) measured AT TRAIN TIME. This is the drift
  *    baseline and is deliberately NOT updated by append folds: updating
  *    it per batch would ratchet the baseline along with the drift and a
  *    slowly shifting distribution would never trigger a retrain.
  *  - `nVectors` — standing row count (append bookkeeping).
  *
  * Each fold assigns ONLY the batch under the standing centroids (work ∝
  * batch), measures the batch's mean residual against the baseline, and:
  *  - ratio ≤ `retrainRatio` → append the batch's assigned rows; done.
  *  - ratio > `retrainRatio` → the centroids no longer cover the data
  *    (the batch lands far from every list): retrain over the UNION via
  *    [[VectorOps.trainIvfFrom]] (bounded deterministic sample — never a
  *    full pass more than the one re-assignment requires), re-assign
  *    all rows, and reset the baseline.
  *
  * Idempotence caveat (vs CorpusMaintain's exactly-once fold): folding
  * the same batch twice APPENDS twice — dedup belongs to CorpusMaintain,
  * which decides admission; feed this fold only the `admitted` rows of a
  * corpus fold and the two states stay consistent by construction.
  */
object AnnMaintain {

  /** The standing index: centroids + assigned lists + drift baseline. */
  final case class AnnState(
      model: VectorOps.IvfModel,
      assigned: DataFrame,
      meanResid: Double,
      nVectors: Long) {
    def save(spark: SparkSession, path: String): Unit = {
      model.save(spark, s"$path/model")
      assigned.write.mode("overwrite").parquet(s"$path/assigned")
      import spark.implicits._
      Seq((meanResid, nVectors)).toDF("mean_resid", "n_vectors")
        .repartition(1).write.mode("overwrite").parquet(s"$path/stats")
    }
  }

  object AnnState {
    def load(spark: SparkSession, path: String): AnnState = {
      val stats = spark.read.parquet(s"$path/stats").collect().head
      AnnState(
        VectorOps.IvfModel.load(spark, s"$path/model"),
        spark.read.parquet(s"$path/assigned"),
        stats.getDouble(0), stats.getLong(1))
    }
  }

  /** One fold's outcome: the updated state, the measured drift ratio
    * (batch mean residual / baseline), and whether it crossed the
    * retrain threshold.
    */
  final case class AnnFold(
      state: AnnState,
      driftRatio: Double,
      retrained: Boolean)

  /** (mean finite residual, row count) of an assigned frame — one agg;
    * zero-norm vectors are excluded from the mean but counted.
    */
  private def residStats(assigned: DataFrame): (Double, Long) = {
    val r = assigned.agg(
      avg(when(abs(col("resid")) < lit(Double.PositiveInfinity),
        col("resid"))).as("mr"),
      count(lit(1)).as("n")).collect().head
    (if (r.isNullAt(0)) 0.0 else r.getDouble(0), r.getLong(1))
  }

  /** Train-and-assign over the initial corpus — the index build job. */
  def build(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 32): AnnState = {
    val model = VectorOps.trainIvfModel(corpus, idCol, vecCol, nCentroids)
    val assigned = VectorOps.assignLists(corpus, idCol, vecCol, model)
    val (mr, n) = residStats(assigned)
    AnnState(model, assigned, mr, n)
  }

  // ---- SQ8 standing index (the byte-coded corpus, r8c) ---------------
  // The SQ8 analog of the IVF state: ranges are fixed at train time, so
  // an append-only fold encodes new vectors with the STANDING ranges —
  // stored codes stay valid precisely because the ranges never move
  // between retrains. The drift statistic is the CLAMP FRACTION: the
  // share of (row, dim) cells landing outside [min, max] (clamped to a
  // byte end, unbounded per-cell error). Past the threshold, retrain is
  // one exact min/max pass over the union — and then EVERY row
  // re-encodes (codes are range-relative): a pure map, the deliberate
  // cost asymmetry vs the IVF fold where re-assignment needs Lloyd's.

  /** The standing SQ8 corpus: range model + encoded table + count. */
  final case class Sq8State(
      model: VectorOps.Sq8Model,
      encoded: DataFrame,
      nVectors: Long)

  final case class Sq8Fold(
      state: Sq8State,
      clampFrac: Double,
      retrained: Boolean)

  /** Fraction of (row, dimension) cells of `c` (an internal
    * (corpus_id, cq, …) frame) outside the model's trained ranges.
    */
  private def clampStats(
      c: DataFrame, m: VectorOps.Sq8Model): (Double, Long) = {
    val maxs = m.mins.indices.map(d => m.mins(d) + 255.0 * m.deltas(d))
    val below = aggregate(
      zip_with(col("cq"), typedlit(m.mins.toSeq),
        (x, mn) => (x < mn).cast("long")), lit(0L), _ + _)
    val above = aggregate(
      zip_with(col("cq"), typedlit(maxs),
        (x, mx) => (x > mx).cast("long")), lit(0L), _ + _)
    val r = c.agg(sum(below + above).as("clamped"),
      count(lit(1)).as("n")).collect().head
    val n = r.getLong(1)
    val frac =
      if (n == 0) 0.0
      else r.getLong(0).toDouble / (n.toDouble * m.mins.length)
    (frac, n)
  }

  private def internal(
      df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("corpus_id"),
        VectorOps.quantize(col(vecCol)).as("cq"))
      .withColumn("cn2",
        graft.functions.VectorExpressions.dot(col("cq"), col("cq")))

  /** Range-train and encode the initial corpus — the SQ8 build job. */
  def buildSq8(
      corpus: DataFrame, idCol: String, vecCol: String): Sq8State = {
    val c = internal(corpus, idCol, vecCol)
    val model = VectorOps.trainSq8Model(corpus, idCol, vecCol)
    val n = c.count()
    Sq8State(model, VectorOps.encodeSq8(c, model), n)
  }

  /** Fold newly admitted vectors into the standing SQ8 corpus. */
  def foldSq8(
      state: Sq8State, batch: DataFrame, idCol: String, vecCol: String,
      retrainFrac: Double = 0.05): Sq8Fold = {
    require(retrainFrac > 0.0 && retrainFrac < 1.0,
      s"retrainFrac must be in (0,1): $retrainFrac")
    val b = internal(batch, idCol, vecCol)
    val (frac, batchN) = clampStats(b, state.model)
    if (frac <= retrainFrac) {
      Sq8Fold(
        state.copy(
          encoded = state.encoded
            .unionByName(VectorOps.encodeSq8(b, state.model)),
          nVectors = state.nVectors + batchN),
        frac, retrained = false)
    } else {
      // the standing table stores ALREADY-quantized vectors, so retrain
      // through the internal trainer (re-quantizing would re-scale)
      val union = state.encoded.select("corpus_id", "cq", "cn2")
        .unionByName(b)
      val model2 = VectorOps.trainSq8From(union)
      Sq8Fold(
        Sq8State(model2, VectorOps.encodeSq8(union, model2),
          state.nVectors + batchN),
        frac, retrained = true)
    }
  }

  /** Fold a batch of newly admitted vectors into the standing index. */
  def fold(
      state: AnnState, batch: DataFrame, idCol: String, vecCol: String,
      retrainRatio: Double = 2.0, nCentroids: Int = 32): AnnFold = {
    require(retrainRatio > 1.0, s"retrainRatio must exceed 1: $retrainRatio")
    val batchAssigned =
      VectorOps.assignLists(batch, idCol, vecCol, state.model)
    val (batchResid, batchN) = residStats(batchAssigned)
    val ratio = batchResid / math.max(state.meanResid, 1e-12)
    if (ratio <= retrainRatio) {
      AnnFold(
        state.copy(assigned = state.assigned.unionByName(batchAssigned),
          nVectors = state.nVectors + batchN),
        ratio, retrained = false)
    } else {
      val union = state.assigned.select("corpus_id", "cq")
        .unionByName(batchAssigned.select("corpus_id", "cq"))
      val model2 = VectorOps.trainIvfFrom(union, nCentroids)
      val assigned2 = VectorOps.assignQuantized(union, model2)
      val (mr2, n2) = residStats(assigned2)
      AnnFold(AnnState(model2, assigned2, mr2, n2), ratio, retrained = true)
    }
  }

  // ---- IVFPQ standing index (the coded-lists corpus, r8d) ------------
  // The flagship production index under maintenance: centroids AND
  // codebooks are train-once, each fold assigns + PQ-encodes only the
  // batch with the STANDING model (stored codes stay valid because the
  // codebooks never move between retrains — the SQ8 range argument, one
  // level up). Drift statistic: the same scale-free coverage residual
  // as the IVF fold (encodeIvfPq emits `resid` per row); PQ code error
  // is bounded by list coverage, so when the lists still cover the data
  // the shared codebooks do too.

  /** The standing IVFPQ index: model + coded lists + drift baseline. */
  final case class PqState(
      model: VectorOps.IvfPqModel,
      encoded: DataFrame,
      meanResid: Double,
      nVectors: Long) {
    def save(spark: SparkSession, path: String): Unit = {
      model.save(spark, s"$path/model")
      encoded.write.mode("overwrite").parquet(s"$path/encoded")
      import spark.implicits._
      Seq((meanResid, nVectors)).toDF("mean_resid", "n_vectors")
        .repartition(1).write.mode("overwrite").parquet(s"$path/stats")
    }
  }

  object PqState {
    def load(spark: SparkSession, path: String): PqState = {
      val stats = spark.read.parquet(s"$path/stats").collect().head
      PqState(
        VectorOps.IvfPqModel.load(spark, s"$path/model"),
        spark.read.parquet(s"$path/encoded"),
        stats.getDouble(0), stats.getLong(1))
    }
  }

  final case class PqFold(
      state: PqState,
      driftRatio: Double,
      retrained: Boolean)

  /** Train-and-encode over the initial corpus — the IVFPQ build job. */
  def buildPq(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 32, m: Int = 8, codebookSize: Int = 32,
      residual: Boolean = true): PqState = {
    val model = VectorOps.trainIvfPqModel(
      corpus, idCol, vecCol, nCentroids, m, codebookSize, residual)
    val encoded = VectorOps.encodeIvfPq(corpus, idCol, vecCol, model)
    val (mr, n) = residStats(encoded)
    PqState(model, encoded, mr, n)
  }

  /** Fold a batch of newly admitted vectors into the standing IVFPQ
    * index: encode-only below the drift threshold; above it, retrain
    * centroids AND codebooks over the union and re-encode every row
    * (codes are model-relative — the SQ8 re-encode asymmetry).
    */
  def foldPq(
      state: PqState, batch: DataFrame, idCol: String, vecCol: String,
      retrainRatio: Double = 2.0, nCentroids: Int = 32,
      codebookSize: Int = 32): PqFold = {
    require(retrainRatio > 1.0, s"retrainRatio must exceed 1: $retrainRatio")
    val batchEnc = VectorOps.encodeIvfPq(batch, idCol, vecCol, state.model)
    val (batchResid, batchN) = residStats(batchEnc)
    val ratio = batchResid / math.max(state.meanResid, 1e-12)
    if (ratio <= retrainRatio) {
      PqFold(
        state.copy(encoded = state.encoded.unionByName(batchEnc),
          nVectors = state.nVectors + batchN),
        ratio, retrained = false)
    } else {
      val union = state.encoded.select("corpus_id", "cq")
        .unionByName(batchEnc.select("corpus_id", "cq"))
      val model2 = VectorOps.trainIvfPqFrom(
        union, nCentroids, state.model.m, codebookSize,
        state.model.residual)
      val encoded2 = VectorOps.encodeQuantizedIvfPq(union, model2)
      val (mr2, n2) = residStats(encoded2)
      PqFold(PqState(model2, encoded2, mr2, n2), ratio, retrained = true)
    }
  }
}
