package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashedBow, HashedLogitExpr}
import org.apache.spark.sql.graftbridge.Bridge

/** Trained model-based quality filtering — the fastText/CCNet-style
  * classifier rung of the quality ladder (Joulin et al. 2017; Wenzek et
  * al. 2020 train fastText on Wikipedia-vs-CommonCrawl; GPT-3 App. A and
  * LLaMA use the same shape as a page-quality screen). The heuristic
  * rungs (t02 stats, t14 Gopher gates, t16/t20 LM surprisal) hard-code
  * their thresholds; this one LEARNS a separating direction from labeled
  * examples — typically "docs that pass the heuristic gates" or "docs
  * from a trusted reference corpus" — and generalizes beyond the
  * features any single rule encodes.
  *
  * Model: logistic regression over hashed SET-of-words features (binary
  * presence per hashed bucket — presence, not frequency, because quality
  * signals are typically presence-shaped: a required stopword, a
  * boilerplate marker) plus 16 reserved log-length slots for the
  * length-driven rules a pure BoW is blind to. dim defaults to 4096
  * buckets; hash collisions are the standard hashing-trick tradeoff and
  * part of the learned model.
  *
  * Train/score split follows the lloydLocal/BPE convention for driver-
  * bounded model fitting at 100 TB scale:
  *
  *  - '''train''' collects a BOUNDED deterministic sample (top-`maxSample`
  *    by md5 of the text — seeded, order-stable, a TakeOrderedAndProject,
  *    never a full collect), featurizes on the driver, and runs
  *    full-batch gradient descent with a FIXED iteration order — training
  *    is bit-reproducible run to run (spec-asserted), unlike a
  *    distributed SGD whose partition merge order would wobble the
  *    low-order bits.
  *  - '''score''' is one fused codegen'd expression
  *    ([[graft.functions.HashedLogitExpr]]) against the broadcast weight
  *    vector (dim × 8 B ≈ 32 KB per executor, the IVF-codebook shipping
  *    shape): a pure scan-stage map — no explode, no join, no shuffle at
  *    any corpus size, and stateless, so it streams in any output mode
  *    (the TokenBitsExpr precedent).
  *
  * The model persists as plain parquet (idx, weight) rows with the bias
  * at idx = −1 (the Sq8Model convention): train once on the standing
  * corpus, reload per scoring job.
  */
object QualityModel {

  /** A trained linear quality model: `dim` hashed-BoW weights followed
    * by the 16 reserved log-length slots, plus the bias.
    */
  final case class LinearQualityModel(bias: Double, weights: Array[Double]) {
    require(weights.length > HashedBow.LenBuckets,
      "weight vector must hold dim hashed buckets + the reserved length slots")

    /** Hashed-bucket count (the weight tail holds the length slots). */
    def dim: Int = weights.length - HashedBow.LenBuckets

    /** Sequential reference scorer — token-order summation identical to
      * the fused expression's, so the two are STRICTLY equal (spec gate).
      */
    def scoreText(text: String): Double = {
      val toks = text.split(" ").filter(_.nonEmpty)
      val seen = scala.collection.mutable.Set[Int]()
      var sum = 0.0
      toks.foreach { t =>
        val b = HashedBow.bucketOf(t, dim)
        if (seen.add(b)) sum += weights(b)
      }
      bias + sum + weights(dim + HashedBow.lenBucket(toks.length))
    }

    /** The fused scan-stage scoring column:
      * `bias + Σ_distinct w[bucket(tok)] + w[dim + lenBucket(n_tok)]`.
      */
    def logit(text: Column): Column =
      Bridge.column(HashedLogitExpr(Bridge.expression(text), weights, bias))

    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      ((-1, bias) +: weights.indices.map(d => (d, weights(d))))
        .toDF("idx", "weight")
        .repartition(1).write.mode("overwrite").parquet(path)
    }
  }

  object LinearQualityModel {
    def load(spark: SparkSession, path: String): LinearQualityModel = {
      val rows = spark.read.parquet(path).orderBy("idx").collect()
      require(rows.nonEmpty && rows.head.getInt(0) == -1,
        s"no bias row in quality model at $path")
      LinearQualityModel(rows.head.getDouble(1),
        rows.tail.map(_.getDouble(1)))
    }
  }

  /** Sparse featurized training example: sorted DISTINCT bucket ids,
    * token total, and the {0,1} label.
    */
  private final case class Example(
      buckets: Array[Int], nTok: Int, label: Double)

  private val LenB = HashedBow.LenBuckets

  /** Train by full-batch logistic-loss gradient descent over a bounded
    * deterministic sample. `labelCol` must be 0.0/1.0 (1 = keep-quality).
    *
    * Scale shape: the ONLY distributed work is the sample selection —
    * an orderBy(md5).limit() that plans as TakeOrderedAndProject (each
    * partition keeps `maxSample` rows, driver merges winners); the
    * gradient loop touches `maxSample` pre-featurized sparse rows per
    * iteration on the driver, independent of corpus size. This is the
    * BPE-trainer convention: model fitting is bounded, model APPLICATION
    * is the distributed scan-stage pass.
    */
  /** The bounded deterministic sample selection — split out so
    * QualitySpec can assert it plans as TakeOrderedAndProject (each
    * partition keeps maxSample rows, the driver merges winners; never
    * a global sort or full collect).
    */
  private[graft] def sampleFrame(
      df: DataFrame, textCol: String, labelCol: String,
      maxSample: Int): DataFrame =
    df.select(col(textCol).cast("string"),
        col(labelCol).cast("double"), md5(col(textCol)).as("k"))
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      // label tiebreak: duplicate texts tie on k, and the limit boundary
      // would otherwise pick winners by partition order — not reproducible
      .orderBy(col("k"), col(labelCol)).limit(maxSample)

  def train(
      df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 4096, iters: Int = 200, lr: Double = 2.0,
      maxSample: Int = 10000): LinearQualityModel = {
    require(dim > 0 && iters > 0 && maxSample > 0, "bad hyperparameters")
    val rows = sampleFrame(df, textCol, labelCol, maxSample).collect()
    require(rows.nonEmpty, "no labeled rows to train on")
    // weight layout: [0, dim) hashed token buckets, [dim, dim+16) the
    // reserved log-length slots (coefficient 1 — see HashedBow.LenBuckets)
    val sample: Array[Example] = rows.map { r =>
      val toks = r.getString(0).split(" ").filter(_.nonEmpty)
      val buckets = toks.map(t => HashedBow.bucketOf(t, dim))
        .distinct.sorted
      Example(buckets, toks.length, r.getDouble(1))
    }
    val n = sample.length
    val w = new Array[Double](dim + LenB)
    var bias = 0.0
    var it = 0
    while (it < iters) {
      val grad = new Array[Double](dim + LenB)
      var gb = 0.0
      var i = 0
      while (i < n) {
        val ex = sample(i)
        val lenSlot = dim + HashedBow.lenBucket(ex.nTok)
        var margin = bias + w(lenSlot)
        var j = 0
        while (j < ex.buckets.length) {
          margin += w(ex.buckets(j))
          j += 1
        }
        val p = 1.0 / (1.0 + math.exp(-margin))
        val err = p - ex.label
        j = 0
        while (j < ex.buckets.length) {
          grad(ex.buckets(j)) += err
          j += 1
        }
        grad(lenSlot) += err
        gb += err
        i += 1
      }
      var d = 0
      while (d < dim + LenB) { w(d) -= lr * grad(d) / n; d += 1 }
      bias -= lr * gb / n
      it += 1
    }
    LinearQualityModel(bias, w)
  }
}
