package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenizer (Kudo 2018) — the second of
  * the two production subword algorithms, beside BPE (t17): where BPE
  * GROWS a vocabulary bottom-up by merge frequency, unigram SHRINKS a
  * large seed vocabulary top-down by EM-estimated likelihood loss, and
  * segments by Viterbi max-likelihood instead of greedy merge order.
  * Training follows the t17/lloydLocal convention for 100 TB corpora:
  * the corpus collapses to a partial-agg (word, freq) rollup (size =
  * vocabulary, not corpus) and the EM/prune loop runs on the driver
  * over the bounded top-`maxWords` head; counting is a codegen'd
  * Viterbi pass ([[graft.functions.UnigramCountExpr]]) with a bounded
  * per-executor word memo (Zipf).
  *
  * EM here is exact forward-backward over each word's segmentation
  * lattice in log space (logsumexp — no underflow however long the
  * word), expected piece counts weighted by word frequency; pruning
  * keeps all single characters (so every word stays segmentable) and
  * drops the lowest-expected-count tail until `vocabSize` holds.
  * UnigramSpec gates: per-iteration corpus log-likelihood is
  * monotonically non-decreasing (the EM invariant), Viterbi equals
  * brute-force enumeration on short words, training is bit-reproducible,
  * and the model round-trips through parquet.
  */
object UnigramTokenizer {

  /** A trained unigram model: piece → log probability. `llTrace` records
    * the corpus log-likelihood after each EM iteration (the spec gate).
    */
  final case class UnigramModel(
      pieces: Map[String, Double], llTrace: Seq[Double]) {

    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      pieces.toSeq.sortBy(_._1).toDF("piece", "logp")
        .repartition(1).write.mode("overwrite").parquet(path)
    }
  }

  object UnigramModel {
    def load(spark: SparkSession, path: String): UnigramModel = {
      val rows = spark.read.parquet(path).orderBy("piece").collect()
      require(rows.nonEmpty, s"empty unigram model at $path")
      UnigramModel(
        rows.map(r => r.getString(0) -> r.getDouble(1)).toMap, Nil)
    }
  }

  private val NegInf = Double.NegativeInfinity

  private def logSumExp(a: Double, b: Double): Double =
    if (a == NegInf) b
    else if (b == NegInf) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Train on the corpus's word-frequency head. The distributed part is
    * ONE partial-agg rollup + top-`maxWords` (TakeOrderedAndProject);
    * everything after is a driver loop over ≤ maxWords entries whose
    * cost is independent of corpus size.
    */
  def train(
      df: DataFrame, textCol: String, vocabSize: Int,
      maxWords: Int = 65536, maxPieceLen: Int = 8, emIters: Int = 2,
      pruneFrac: Double = 0.25): UnigramModel = {
    require(vocabSize > 0 && maxPieceLen > 0 && emIters > 0, "bad params")
    require(pruneFrac > 0 && pruneFrac < 1, s"bad pruneFrac $pruneFrac")
    val wf: Array[(String, Long)] = df
      .select(explode(expr(
        s"regexp_extract_all($textCol, '[A-Za-z]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(wf.nonEmpty, "no alpha words to train on")
    train(wf, vocabSize, maxPieceLen, emIters, pruneFrac)
  }

  /** Driver-side core, exposed for spec use on crafted word lists. */
  private[graft] def train(
      wf: Array[(String, Long)], vocabSize: Int, maxPieceLen: Int,
      emIters: Int, pruneFrac: Double): UnigramModel = {
    // ---- seed: all substrings ≤ maxPieceLen by summed word frequency,
    // capped at 4×vocabSize; single chars always in
    val subFreq = scala.collection.mutable.HashMap.empty[String, Long]
    wf.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          subFreq(p) = subFreq.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val chars: Set[String] = subFreq.keysIterator.filter(_.length == 1).toSet
    val seedCap = math.max(vocabSize * 4, chars.size + 1)
    val seed: Seq[String] = {
      val top = subFreq.toSeq.sortBy { case (p, f) => (-f, p) }
        .take(seedCap).map(_._1)
      (top ++ chars).distinct
    }
    // initial log-probs ∝ substring frequency
    var logp: Map[String, Double] = {
      val tot = seed.sortBy(identity).map(p => subFreq(p).toDouble).sum
      seed.map(p => p -> math.log(subFreq(p) / tot)).toMap
    }

    val trace = Vector.newBuilder[Double]

    // exact forward-backward over one word's lattice; returns (ll
    // contribution, per-piece expected counts added into `acc`)
    def eStepWord(
        w: String, f: Long, lp: Map[String, Double],
        acc: scala.collection.mutable.HashMap[String, Double]): Double = {
      val n = w.length
      val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxPieceLen)
        while (j < i) {
          if (alpha(j) != NegInf) {
            lp.get(w.substring(j, i)).foreach { p =>
              alpha(i) = logSumExp(alpha(i), alpha(j) + p)
            }
          }
          j += 1
        }
        i += 1
      }
      val z = alpha(n)
      if (z == NegInf) return 0.0 // unsegmentable (chars pruned? never)
      val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
      i = n - 1
      while (i >= 0) {
        var k = i + 1
        while (k <= math.min(n, i + maxPieceLen)) {
          if (beta(k) != NegInf) {
            lp.get(w.substring(i, k)).foreach { p =>
              beta(i) = logSumExp(beta(i), p + beta(k))
            }
          }
          k += 1
        }
        i -= 1
      }
      i = 0
      while (i < n) {
        var k = i + 1
        while (k <= math.min(n, i + maxPieceLen)) {
          val piece = w.substring(i, k)
          lp.get(piece).foreach { p =>
            val e = math.exp(alpha(i) + p + beta(k) - z) * f
            if (e > 0) acc(piece) = acc.getOrElse(piece, 0.0) + e
          }
          k += 1
        }
        i += 1
      }
      f * z
    }

    def emRound(lp: Map[String, Double]): (Map[String, Double], Double) = {
      val acc = scala.collection.mutable.HashMap.empty[String, Double]
      var ll = 0.0
      wf.foreach { case (w, f) => ll += eStepWord(w, f, lp, acc) }
      // deterministic normalization: fixed (sorted) summation order
      val entries = acc.toSeq.sortBy(_._1)
      val tot = entries.map(_._2).sum
      val next = entries.collect {
        case (p, c) if c > 0 => p -> math.log(c / tot)
      }.toMap
      // pieces with zero expected count vanish UNLESS single chars (kept
      // at floor so every word remains segmentable)
      val floor = math.log(1e-12)
      val withChars = chars.foldLeft(next) { (m, c) =>
        if (m.contains(c)) m else m + (c -> floor)
      }
      (withChars, ll)
    }

    // ---- EM + prune until the vocabulary fits. Single chars are an
    // unprunable floor (words must stay segmentable), so a vocabSize
    // below the char count converges TO that floor and stops — the
    // size-progress check below, not an infinite prune loop.
    var done = false
    var lastSize = -1
    while (!done) {
      var it = 0
      while (it < emIters) {
        val (next, ll) = emRound(logp)
        logp = next; trace += ll
        it += 1
      }
      if (logp.size <= vocabSize || logp.size == lastSize) done = true
      else {
        lastSize = logp.size
        // prune lowest-expected-count tail (recompute counts at the
        // current model), keeping single chars unconditionally
        val acc = scala.collection.mutable.HashMap.empty[String, Double]
        wf.foreach { case (w, f) => eStepWord(w, f, logp, acc) }
        val keepN = math.max(vocabSize, (logp.size * (1 - pruneFrac)).toInt)
        val ranked = logp.keysIterator.filterNot(chars)
          .map(p => (p, acc.getOrElse(p, 0.0))).toSeq
          .sortBy { case (p, c) => (-c, p) }
        val kept = ranked.take(math.max(0, keepN - chars.size)).map(_._1)
        val keepSet = kept.toSet ++ chars
        logp = logp.view.filterKeys(keepSet).toMap
      }
    }
    UnigramModel(logp, trace.result())
  }
}
