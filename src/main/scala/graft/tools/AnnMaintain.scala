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
}
