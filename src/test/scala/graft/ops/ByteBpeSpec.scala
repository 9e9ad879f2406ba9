package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{ByteBpeVocab, BytePretok}

/** Gates for the byte-level BPE family (t32/t33): the pretokenizer's
  * lossless-concatenation invariant, zero-OOV encode over multilingual
  * text the alpha-run engine cannot represent, total decode round-trip,
  * count ≡ size(ids) by shared engine, trainer determinism, and strict
  * trainer+encoder equality against an independent
  * merge-all-occurrences-then-rescan reference (the BpeFidelitySpec
  * convention).
  */
class ByteBpeSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private val multilingual = Seq(
    "the quick brown fox",
    "naïve café résumé",
    "日本語のテキストです",
    "emoji soup 🍜🔥🎉 done",
    "mixed 中文 and English, with punct!!! and   runs of spaces",
    "tabs\tand\nnewlines\r\nmixed",
    "", // empty doc
    "1234 5678 90",
    "ß ẞ Straße"
  )

  // ---- independent reference (merge-all-then-rescan formulation) ------

  private type Syms = Vector[String]

  private def applyMerge(w: Syms, a: String, b: String): Syms = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += w(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(
      freq: Map[Syms, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab = freq
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairs = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var j = 0
        while (j + 1 < syms.length) {
          val p = (syms(j), syms(j + 1))
          pairs(p) = pairs.getOrElse(p, 0L) + f
          j += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((a, b), _) = pairs.maxBy { case ((x, y), c) => (c, x, y) }
        merges += ((a, b))
        vocab = vocab.map { case (syms, f) => applyMerge(syms, a, b) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
        i += 1
      }
    }
    merges.toSeq
  }

  /** Reference encode: apply each merge to ALL occurrences in training
    * order (the rescan formulation — independent of the engine's
    * one-lowest-rank-pair-per-step loop).
    */
  private def refEncode(
      pretoken: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms: Syms =
      BytePretok.toSymbols(pretoken).map(_.toString).toVector
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = applyMerge(syms, a, b)
    }
    syms
  }

  private def pretokenFreq(texts: Seq[String]): Map[Syms, Long] = {
    import scala.jdk.CollectionConverters._
    texts.flatMap(t => BytePretok.split(t).asScala)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
      .map { case (p, f) =>
        BytePretok.toSymbols(p).map(_.toString).toVector -> f
      }
  }

  test("pretokenizer: concatenating pretokens reproduces the input " +
    "exactly (lossless precondition), including multilingual text") {
    import scala.jdk.CollectionConverters._
    val corpus = multilingual ++ Tables.load(spark, dir, "documents")
      .select("text").limit(50).as[String].collect().toSeq
    corpus.foreach { t =>
      assert(BytePretok.split(t).asScala.mkString == t, s"on: $t")
    }
  }

  test("pretokenizer: GPT-2 space attachment — only a literal space " +
    "joins the next token; tab/newline stand alone (the ` ?` rule)") {
    import scala.jdk.CollectionConverters._
    assert(BytePretok.split("a b").asScala.toSeq == Seq("a", " b"))
    assert(BytePretok.split("a   b").asScala.toSeq == Seq("a", "  ", " b"))
    assert(BytePretok.split("hi! 42").asScala.toSeq == Seq("hi", "!", " 42"))
    // ` ?` attaches ONLY 0x20: the run " \t\n" before "b" splits as
    // `\s+(?!\S)` = " \t", then the lone "\n" (not a space) stands
    // alone — matching the published regex, where the r9 impl glued
    // "\nb" together
    assert(BytePretok.split("a \t\nb").asScala.toSeq ==
      Seq("a", " \t", "\n", "b"))
    assert(BytePretok.split("a\tb").asScala.toSeq == Seq("a", "\t", "b"))
    assert(BytePretok.split("trail  ").asScala.toSeq == Seq("trail", "  "))
  }

  test("zero OOV + total round-trip: decode(encode(s)) == s for " +
    "arbitrary multilingual input; every id is in [0, 256 + nMerges)") {
    val docs = multilingual.toDF("text")
    val merges = TextOps.trainByteBpeMerges(docs, "text", nMerges = 60)
    val table = ByteBpeVocab.decodeTable(merges)
    val rows = docs.select(col("text"),
        TextOps.byteBpeEncodeIds(col("text"), merges).as("ids"))
      .collect()
    assert(rows.length == multilingual.length)
    rows.foreach { r =>
      val ids = r.getSeq[Int](1)
      assert(ids.forall(id => id >= 0 && id < 256 + merges.size),
        s"id out of range on: ${r.getString(0)}")
      val decoded =
        BytePretok.fromSymbols(ids.map(table).mkString)
      assert(decoded == r.getString(0))
    }
  }

  test("count ≡ size(ids) in-row, and trained merges compress the " +
    "corpus vs the untrained byte baseline (sf0.01)") {
    val docs = Tables.load(spark, dir, "documents").limit(200)
    val merges = TextOps.trainByteBpeMerges(docs, "text", nMerges = 200)
    val r = docs.select(
        TextOps.byteBpeTokenCount(col("text"), merges).as("n"),
        size(TextOps.byteBpeEncodeIds(col("text"), merges)).as("sz"),
        octet_length(col("text")).as("bytes"))
      .agg(sum(when(col("n") =!= col("sz"), 1).otherwise(0)).as("mismatch"),
        sum(col("n")).as("tok"), sum(col("bytes")).as("bytes"))
      .collect()(0)
    assert(r.getLong(0) == 0L, "count and encode disagree")
    // untrained byte BPE = 1 token per byte; 200 merges on a small
    // vocabulary must compress substantially
    assert(r.getLong(1) < r.getLong(2) / 2,
      s"merges barely compress: ${r.getLong(1)} tokens for ${r.getLong(2)} bytes")
  }

  test("trainer is deterministic and equals the independent reference " +
    "trainer; engine encode equals the rescan reference encoder (sf0.01)") {
    import scala.jdk.CollectionConverters._
    val docs = Tables.load(spark, dir, "documents").limit(200)
    val merges = TextOps.trainByteBpeMerges(docs, "text", nMerges = 120)
    val again = TextOps.trainByteBpeMerges(docs, "text", nMerges = 120)
    assert(merges == again, "training is not deterministic")

    val texts = docs.select("text").as[String].collect().toSeq
    val refMerges = refTrain(pretokenFreq(texts), 120)
    assert(merges == refMerges,
      "distributed rollup + driver loop diverges from reference trainer")

    val table = ByteBpeVocab.decodeTable(merges)
    val got = texts.toDF("text")
      .select(col("text"),
        TextOps.byteBpeEncodeIds(col("text"), merges).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    texts.take(50).foreach { t =>
      val expect = BytePretok.split(t).asScala
        .flatMap(p => refEncode(p, refMerges)).toVector
      val decoded = got(t).map(table).toVector
      assert(decoded == expect, s"encoder diverges from reference on: $t")
    }
  }
}
