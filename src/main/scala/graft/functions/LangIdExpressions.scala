package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused multiclass linear-model scoring over hashed set-of-words
  * features: ONE pass over the raw text accumulating all K class margins
  * `bias_k + Σ_distinct w_k[bucket(tok)] + w_k[dim + lenBucket(n_tok)]`
  * against a broadcast K × (dim + 16) weight matrix, returning the argmax
  * class label — the scan-stage hot path of the trained language
  * identifier ([[graft.ops.LangIdModel]], the fastText lang-ID shape of
  * Joulin et al. 2017 that CCNet runs before perplexity bucketing).
  *
  * Shares [[HashedBow]]'s hashing (same buckets as the binary quality
  * model, so the two classifiers see the same feature space) and the
  * binary-presence convention: each distinct token bucket fires once per
  * class. Ties break to the LOWEST class index — the training-label sort
  * order — mirroring the fixed priority order of the marker heuristic
  * (`TextOps.langId`), so the result is deterministic. An empty document
  * scores every class as bias + the n=0 length slot and returns the
  * first label.
  *
  * Scale shape: stateless, no shuffle at any corpus size, streams in any
  * output mode; the weight matrix (K × (dim+16) × 8 B, K=5 × 4112 →
  * 160 KB) ships per executor exactly like the IVF codebooks.
  */
case class HashedArgmaxExpr(
    child: Expression, labels: Array[String],
    biases: Array[Double], weights: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(labels.length >= 2 && labels.length == biases.length &&
    labels.length == weights.length &&
    weights.forall(_.length == weights.head.length) &&
    weights.head.length > HashedBow.LenBuckets,
    "need >= 2 classes with equal-length weight vectors incl. length slots")

  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_hashed_argmax"

  @transient private lazy val scorer =
    new HashedArgmaxScorer(labels, biases, weights)

  override protected def nullSafeEval(input: Any): Any =
    scorer.predict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedArgmax",
      new HashedArgmaxScorer(labels, biases, weights),
      classOf[HashedArgmaxScorer].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.predict($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedArgmaxExpr =
    copy(child = newChild)
}

/** Executor-side scorer behind [[HashedArgmaxExpr]]: tight loop over the
  * UTF-8 bytes (tokens are maximal runs between 0x20, identical to
  * [[HashedLogitScorer]]), no java String materialization on the hot
  * path. Distinct buckets dedup via a dim-bit scratch bitset.
  */
final class HashedArgmaxScorer(
    labels: Array[String], biases: Array[Double],
    weights: Array[Array[Double]]) extends Serializable {

  private val k = labels.length
  private val dim = weights(0).length - HashedBow.LenBuckets
  private val utf8Labels: Array[UTF8String] =
    labels.map(UTF8String.fromString)
  @transient private lazy val seen = new Array[Long]((dim + 63) / 64)
  @transient private lazy val margins = new Array[Double](k)

  def predict(text: UTF8String): UTF8String =
    utf8Labels(argmax(text))

  /** Winning class index (exposed for the margins-equality spec). */
  def argmax(text: UTF8String): Int = {
    java.util.Arrays.fill(seen, 0L)
    System.arraycopy(biases, 0, margins, 0, k)
    val bytes = text.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != 0x20) {
        val start = i
        while (i < bytes.length && bytes(i) != 0x20) i += 1
        val b = HashedBow.bucket(
          UTF8String.fromBytes(bytes, start, i - start), dim)
        if ((seen(b >> 6) & (1L << (b & 63))) == 0L) {
          seen(b >> 6) |= 1L << (b & 63)
          var c = 0
          while (c < k) { margins(c) += weights(c)(b); c += 1 }
        }
        n += 1
      } else i += 1
    }
    val lenSlot = dim + HashedBow.lenBucket(n)
    var best = 0
    var c = 0
    while (c < k) {
      margins(c) += weights(c)(lenSlot)
      // strict > keeps the LOWEST index on ties (deterministic priority)
      if (margins(c) > margins(best)) best = c
      c += 1
    }
    best
  }
}
