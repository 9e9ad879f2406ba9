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
}
