package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the fused scan-stage expressions against
  * independent Scala reference implementations — no SparkSession, so
  * hundreds of generated cases run in milliseconds. The reference
  * formulations are the ones the operators' Scaladoc CLAIMS equivalence
  * to (tokens.sliding(n) + builtin-identical xxhash64); these properties
  * make the claim checked rather than asserted.
  */
class PropertySpec extends AnyFunSuite {

  private def run(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // text over a small alphabet incl. runs of spaces (the boundary cases)
  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dä", " ", "  ")).map(_.mkString)

  private def tokens(s: String): List[String] =
    s.split(" ").filter(_.nonEmpty).toList

  private def xx(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  test("NGramHashSet.compute == distinct sliding-window gram hashes") {
    run(Prop.forAll(textGen, Gen.choose(1, 4)) { (s, n) =>
      val got = NGramHashSet.compute(UTF8String.fromString(s), n)
        .toLongArray.toSeq
      val expect = tokens(s).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq.distinct.map(xx)
      got == expect // same values AND same first-occurrence order
    })
  }

  test("BigramSetExpr.compute == distinct adjacent token pairs") {
    run(Prop.forAll(textGen) { s =>
      val got = BigramSetExpr.compute(UTF8String.fromString(s))
        .toArray[UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val expect = tokens(s).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq.distinct
      got == expect
    })
  }

  test("TokenStatsExpr counts match an independent formulation") {
    run(Prop.forAll(textGen) { s =>
      val row = TokenStatsExpr.compute(UTF8String.fromString(s))
      val tk = tokens(s)
      val nTok = row.getInt(0).toLong
      val topN = row.getLong(1)
      val uniqBi = row.getInt(2).toLong
      val expTop =
        if (tk.isEmpty) 0L
        else tk.groupBy(identity).values.map(_.size).max.toLong
      nTok == tk.length.toLong && topN == expTop &&
        uniqBi == tk.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSeq.distinct.length.toLong
    })
  }

  test("HashedLogitScorer == an independent set-of-words formulation") {
    val wGen = Gen.listOfN(20, Gen.choose(-2.0, 2.0))
      .map(_.toArray ++ Array.fill(HashedBow.LenBuckets)(0.1))
    run(Prop.forAll(textGen, wGen, Gen.choose(-1.0, 1.0)) { (s, w, b) =>
      val scorer = new HashedLogitScorer(w, b)
      val dim = w.length - HashedBow.LenBuckets
      val tk = tokens(s)
      val expect = b +
        tk.map(t => HashedBow.bucketOf(t, dim)).distinct
          .map(w(_)).sum +
        w(dim + HashedBow.lenBucket(tk.length))
      scorer.score(UTF8String.fromString(s)) == expect
    })
  }

  test("UnigramCounter Viterbi == brute-force best segmentation") {
    // random small vocabularies over a 3-letter alphabet + random words;
    // the DP must match exhaustive enumeration under (max score, min
    // count) for every generated (vocab, word) pair
    val pieceGen = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = Gen.nonEmptyListOf(
      Gen.zip(pieceGen, Gen.choose(-5.0, -0.1))).map(_.toMap)
    val wordGen = Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    run(Prop.forAll(vocabGen, wordGen) { (vocab, w) =>
      val counter = new UnigramCounter(vocab)
      val oov = vocab.values.min - 10.0
      def lp(p: String): Double = vocab.getOrElse(p,
        if (p.length == 1) oov else Double.NegativeInfinity)
      def brute(i: Int): Seq[(Double, Int)] =
        if (i == w.length) Seq((0.0, 0))
        else (i + 1 to w.length).flatMap { j =>
          val p = lp(w.substring(i, j))
          if (p == Double.NegativeInfinity) Nil
          else brute(j).map { case (sc, c) => (sc + p, c + 1) }
        }
      val best = brute(0).minBy { case (sc, c) => (-sc, c) }
      counter.count(UTF8String.fromString(w)) == best._2
    })
  }

  test("UnigramEncoder size == UnigramCounter count (shared recurrence)") {
    val pieceGen = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = Gen.nonEmptyListOf(
      Gen.zip(pieceGen, Gen.choose(-5.0, -0.1))).map(_.toMap)
    val wordGen = Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    run(Prop.forAll(vocabGen, wordGen) { (vocab, w) =>
      val u = UTF8String.fromString(w)
      new UnigramEncoder(vocab).encode(u).numElements() ==
        new UnigramCounter(vocab).count(u)
    })
  }

  // arbitrary unicode (multilingual chars, emoji via surrogate pairs,
  // whitespace runs incl. tabs/newlines) — the byte-BPE totality domain
  private val uniGen: Gen[String] =
    Gen.listOf(Gen.oneOf(
      "a", "Zb", "日本", "語", "🍜", "é", "ß", "1", "42", "!", "?!",
      " ", "  ", "\t", "\n", "б")).map(_.mkString)

  private val mergeGen: Gen[Seq[(String, String)]] = {
    val symGen = Gen.choose(1, 2).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0x20.toChar, 0xFF.toChar)).map(_.mkString))
    Gen.listOf(Gen.zip(symGen, symGen)).map(_.take(20))
  }

  test("ByteBpe: pretokens concatenate to the input, and decode(encode) " +
    "round-trips ANY unicode string under ANY merge table") {
    import scala.jdk.CollectionConverters._
    run(Prop.forAll(uniGen, mergeGen) { (s, merges) =>
      val pretokOk = BytePretok.split(s).asScala.mkString == s
      val engine = new ByteBpe(merges)
      val ids = engine.encode(UTF8String.fromString(s))
        .toIntArray().toSeq
      val table = ByteBpeVocab.decodeTable(merges)
      val decoded = BytePretok.fromSymbols(ids.map(table).mkString)
      val countOk =
        engine.count(UTF8String.fromString(s)) == ids.length
      val rangeOk = ids.forall(i => i >= 0 && i < 256 + merges.size)
      pretokOk && decoded == s && countOk && rangeOk
    })
  }
}
