package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ops.UnigramTokenizer.UnigramModel

/** Gates for the unigram-LM tokenizer (t25): the EM invariant, Viterbi
  * optimality against brute-force enumeration, bit-reproducible
  * training, the parquet round-trip, and the counting conventions
  * shared with the BPE engine.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // small Zipf-ish word list with shared morphology so multi-char
  // pieces genuinely help (the/them/then; cat/cats; walk/walking)
  private val wf: Array[(String, Long)] = Array(
    "the" -> 120L, "them" -> 30L, "then" -> 25L,
    "cat" -> 60L, "cats" -> 20L, "walk" -> 40L, "walking" -> 15L,
    "ing" -> 5L, "a" -> 80L, "to" -> 70L)

  private def trainSmall(vocabSize: Int = 40, emIters: Int = 5) =
    UnigramTokenizer.train(wf, vocabSize, maxPieceLen = 6,
      emIters = emIters, pruneFrac = 0.25)

  test("EM: corpus log-likelihood is monotonically non-decreasing") {
    // vocab large enough that no pruning interleaves the EM segments
    val m = UnigramTokenizer.train(wf, vocabSize = 1000, maxPieceLen = 6,
      emIters = 6, pruneFrac = 0.25)
    val ll = m.llTrace
    assert(ll.size >= 6)
    ll.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"LL regressed: $a -> $b in $ll")
    }
  }

  test("training is bit-reproducible and respects the vocab target") {
    val m1 = trainSmall(); val m2 = trainSmall()
    assert(m1.pieces == m2.pieces && m1.llTrace == m2.llTrace)
    assert(m1.pieces.size <= 40)
    // every single char survives pruning (words stay segmentable)
    val chars = wf.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(m1.pieces.keySet))
  }

  test("viterbi count equals brute-force enumeration on every train word") {
    val m = trainSmall()
    val counter = new graft.functions.UnigramCounter(m.pieces)
    val oov = m.pieces.values.min - 10.0
    def lp(p: String): Double =
      m.pieces.getOrElse(p,
        if (p.length == 1) oov else Double.NegativeInfinity)
    // all segmentations of w into vocab pieces (+ OOV single chars):
    // (score, pieceCount) of the best under (max score, then min count)
    def brute(w: String): (Double, Int) = {
      def go(i: Int): Seq[(Double, Int)] =
        if (i == w.length) Seq((0.0, 0))
        else (i + 1 to w.length).flatMap { j =>
          val p = lp(w.substring(i, j))
          if (p == Double.NegativeInfinity) Nil
          else go(j).map { case (s, c) => (s + p, c + 1) }
        }
      go(0).minBy { case (s, c) => (-s, c) }
    }
    (wf.map(_._1) ++ Seq("xyzq", "thewalking", "catsss")).foreach { w =>
      val got = counter.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))
      assert(got == brute(w)._2, s"word $w")
    }
  }

  test("frequent whole words become single pieces; counting conventions " +
    "match the BPE engine for non-alpha text") {
    val m = trainSmall()
    val counter = new graft.functions.UnigramCounter(m.pieces)
    def cnt(s: String): Int = counter.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(cnt("the") == 1 && cnt("cat") == 1)
    assert(cnt("12 !") == 3)  // digits/glyphs one each, space none
    assert(cnt("") == 0)
    // the column API agrees with the direct engine
    val viaCol = Seq("the cat 42").toDF("text")
      .select(TextOps.unigramTokenCount(col("text"), m.pieces))
      .collect().head.getInt(0)
    assert(viaCol == cnt("the cat 42"))
  }

  test("model round-trips through parquet") {
    val m = trainSmall()
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    m.save(spark, dir)
    val back = UnigramModel.load(spark, dir)
    assert(back.pieces == m.pieces)
  }

  test("vocabSize below the single-char floor converges to the floor " +
    "instead of looping") {
    // chars alone exceed vocabSize=2; prune stops at the char floor
    val m = UnigramTokenizer.train(wf, vocabSize = 2, maxPieceLen = 4,
      emIters = 2, pruneFrac = 0.5)
    val chars = wf.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(m.pieces.keySet))
    assert(m.pieces.size <= chars.size + 2)
  }

  test("unigramEncodeIds: size equals the counter (shared recurrence); " +
    "ids decode losslessly through the canonical id space") {
    import org.apache.spark.sql.functions.col
    val m = trainSmall()
    val sorted = m.pieces.keys.toArray.sorted
    val counter = new graft.functions.UnigramCounter(m.pieces)
    def decode(ids: Seq[Int]): String = ids.map { id =>
      if (id < sorted.length) sorted(id)
      else (id - sorted.length).toChar.toString // OOV fallback range
    }.mkString
    val texts = Seq("the cat", "walking", "xyzq 42 the!", "", "  cats  ")
    val rows = texts.toDF("text").select(col("text"),
        TextOps.unigramEncodeIds(col("text"), m.pieces).as("ids")).collect()
    rows.foreach { r =>
      val ids = r.getSeq[Int](1)
      val want = counter.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
      assert(ids.length == want, s"size != count for '${r.getString(0)}'")
      assert(decode(ids) == r.getString(0).replace(" ", ""),
        s"round-trip failed for '${r.getString(0)}'")
    }
  }
}
