package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashedArgmaxExpr, HashedBow}
import org.apache.spark.sql.graftbridge.Bridge

/** Trained multiclass language identification — the fastText lang-ID
  * rung (Joulin et al. 2017; CCNet/Wenzek et al. 2020 runs exactly this
  * model in front of its perplexity bucketing; every published web-corpus
  * pipeline — C4, Gopher, RefinedWeb — has the same stage). The t01
  * marker-word heuristic hard-codes 7 markers per language; this LEARNS
  * the per-language vocabulary from a labeled seed corpus and
  * generalizes beyond any fixed marker list.
  *
  * Model: multinomial (softmax) logistic regression over the SAME hashed
  * set-of-words features as the binary quality model
  * ([[QualityModel]] / [[HashedBow]]) — shared hashing, shared
  * binary-presence convention, shared reserved log-length slots — with
  * one weight vector per language and argmax prediction. Softmax (not K
  * independent one-vs-rest fits) because the K margins are trained
  * jointly against each other, which is what argmax consumes; it is also
  * the published fastText objective.
  *
  * Train/score split follows the QualityModel convention for
  * driver-bounded model fitting at 100 TB scale:
  *
  *  - '''train''' collects a BOUNDED deterministic sample (top-`maxSample`
  *    by md5 of the text — a TakeOrderedAndProject, never a full
  *    collect), featurizes once on the driver, and runs full-batch
  *    softmax gradient descent with a FIXED iteration order — training is
  *    bit-reproducible run to run (spec-asserted).
  *  - '''predict''' is one fused codegen'd expression
  *    ([[graft.functions.HashedArgmaxExpr]]) against the broadcast
  *    K × (dim+16) weight matrix: a pure scan-stage map — no explode, no
  *    join, no shuffle at any corpus size, stateless, so it streams in
  *    any output mode and gates `curateStream`/`ReleaseBuild` exactly
  *    like the marker heuristic it replaces.
  *
  * Persists as plain parquet (label, idx, weight) rows with the bias at
  * idx = −1 (the LinearQualityModel convention, one row group per
  * class): train once on the labeled seed, reload per scoring job.
  */
object LangIdModel {

  /** A trained multiclass linear model: per-label bias + weight vector
    * of `dim` hashed buckets followed by the 16 reserved length slots.
    * `labels` is sorted (the tie-break priority order).
    */
  final case class MulticlassLangModel(
      labels: Array[String], biases: Array[Double],
      weights: Array[Array[Double]]) {
    require(labels.length >= 2 && labels.length == biases.length &&
      labels.length == weights.length, "ragged model")
    require(labels.sameElements(labels.sorted),
      "labels must be sorted — the deterministic tie-break order")

    def dim: Int = weights(0).length - HashedBow.LenBuckets

    /** Sequential reference predictor — same accumulation order as the
      * fused expression's, so the two are STRICTLY equal (spec gate).
      */
    def predictText(text: String): String = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val seen = scala.collection.mutable.Set[Int]()
      val margins = biases.clone()
      toks.foreach { t =>
        val b = HashedBow.bucketOf(t, dim)
        if (seen.add(b)) {
          var c = 0
          while (c < labels.length) { margins(c) += weights(c)(b); c += 1 }
        }
      }
      val lenSlot = dim + HashedBow.lenBucket(toks.length)
      var best = 0
      var c = 0
      while (c < labels.length) {
        margins(c) += weights(c)(lenSlot)
        if (margins(c) > margins(best)) best = c
        c += 1
      }
      labels(best)
    }

    /** The fused scan-stage argmax-label column. */
    def predict(text: Column): Column =
      Bridge.column(HashedArgmaxExpr(
        Bridge.expression(text), labels, biases, weights))

    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      labels.indices.flatMap { c =>
        (labels(c), -1, biases(c)) +:
          weights(c).indices.map(d => (labels(c), d, weights(c)(d)))
      }.toDF("label", "idx", "weight")
        .repartition(1).write.mode("overwrite").parquet(path)
    }
  }

  object MulticlassLangModel {
    def load(spark: SparkSession, path: String): MulticlassLangModel = {
      val rows = spark.read.parquet(path)
        .orderBy("label", "idx").collect()
      require(rows.nonEmpty, s"empty lang model at $path")
      val byLabel = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
      val labels = byLabel.map(_._1).toArray
      val biases = byLabel.map { case (l, rs) =>
        require(rs.head.getInt(1) == -1, s"no bias row for $l")
        rs.head.getDouble(2)
      }.toArray
      val weights = byLabel.map(_._2.tail.map(_.getDouble(2))).toArray
      // A truncated/ragged parquet must fail HERE, not as a mis-score or
      // AIOOBE at predict time: every label needs the same complete vector
      // (dim feature slots + LenBuckets length slots), and the idx column
      // must be the contiguous 0..n-1 the argmax kernel indexes by.
      require(weights.forall(_.length == weights.head.length),
        s"ragged lang model at $path: per-label lengths " +
          weights.map(_.length).distinct.mkString(","))
      byLabel.foreach { case (l, rs) =>
        rs.tail.zipWithIndex.foreach { case (r, i) =>
          require(r.getInt(1) == i, s"non-contiguous idx for $l at $path")
        }
      }
      MulticlassLangModel(labels, biases, weights)
    }
  }

  private final case class Example(
      buckets: Array[Int], nTok: Int, label: Int)

  private val LenB = HashedBow.LenBuckets

  /** Bounded deterministic sample for a STRING label column (the
    * QualityModel.sampleFrame shape — plans as TakeOrderedAndProject).
    */
  private[graft] def sampleFrame(
      df: DataFrame, textCol: String, labelCol: String,
      maxSample: Int): DataFrame =
    df.select(col(textCol).cast("string"),
        col(labelCol).cast("string"), md5(col(textCol)).as("k"))
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .orderBy(col("k"), col(labelCol)).limit(maxSample)

  /** Train by full-batch softmax gradient descent over a bounded
    * deterministic sample. `labelCol` holds the language string; the
    * class set is its distinct values in the sample, sorted.
    */
  def train(
      df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 4096, iters: Int = 200, lr: Double = 2.0,
      maxSample: Int = 10000): MulticlassLangModel = {
    require(dim > 0 && iters > 0 && maxSample > 0, "bad hyperparameters")
    val rows = sampleFrame(df, textCol, labelCol, maxSample).collect()
    require(rows.nonEmpty, "no labeled rows to train on")
    val labels = rows.map(_.getString(1)).distinct.sorted
    require(labels.length >= 2, s"need >= 2 classes, got ${labels.toSeq}")
    val labelIdx = labels.zipWithIndex.toMap
    val k = labels.length
    val sample: Array[Example] = rows.map { r =>
      val toks = r.getString(0).split(" ").filter(_.nonEmpty)
      Example(toks.map(t => HashedBow.bucketOf(t, dim)).distinct.sorted,
        toks.length, labelIdx(r.getString(1)))
    }
    val n = sample.length
    val w = Array.fill(k)(new Array[Double](dim + LenB))
    val bias = new Array[Double](k)
    val margins = new Array[Double](k)
    val p = new Array[Double](k)
    var it = 0
    while (it < iters) {
      val grad = Array.fill(k)(new Array[Double](dim + LenB))
      val gb = new Array[Double](k)
      var i = 0
      while (i < n) {
        val ex = sample(i)
        val lenSlot = dim + HashedBow.lenBucket(ex.nTok)
        var c = 0
        while (c < k) {
          var m = bias(c) + w(c)(lenSlot)
          var j = 0
          while (j < ex.buckets.length) { m += w(c)(ex.buckets(j)); j += 1 }
          margins(c) = m
          c += 1
        }
        // softmax with max-shift for stable exps (order-fixed, so still
        // bit-reproducible)
        var mx = margins(0)
        c = 1
        while (c < k) { if (margins(c) > mx) mx = margins(c); c += 1 }
        var z = 0.0
        c = 0
        while (c < k) { p(c) = math.exp(margins(c) - mx); z += p(c); c += 1 }
        c = 0
        while (c < k) {
          val err = p(c) / z - (if (c == ex.label) 1.0 else 0.0)
          var j = 0
          while (j < ex.buckets.length) { grad(c)(ex.buckets(j)) += err; j += 1 }
          grad(c)(lenSlot) += err
          gb(c) += err
          c += 1
        }
        i += 1
      }
      var c = 0
      while (c < k) {
        var d = 0
        while (d < dim + LenB) { w(c)(d) -= lr * grad(c)(d) / n; d += 1 }
        bias(c) -= lr * gb(c) / n
        c += 1
      }
      it += 1
    }
    MulticlassLangModel(labels, bias, w)
  }
}
