package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextOps

/** PorterStemmer / PorterStemExpr gates: the published algorithm's own
  * examples (Porter 1980 — per-step example pairs traced through the
  * full pipeline), interpreter ≡ codegen parity, and the passthrough
  * contract for non-alphabetic input. The stemmer has no SQL mirror, so
  * these vectors ARE the correctness surface for t63_stem_vocab.
  */
class StemSpec extends SparkSpec {
  import spark.implicits._

  // (input, expected) — Porter 1980 example pairs, full-pipeline outputs
  private val vectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b + cleanup
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "motoring" -> "motor", "sing" -> "sing", "conflated" -> "conflat",
    "troubled" -> "troubl", "sized" -> "size", "hopping" -> "hop",
    "tanned" -> "tan", "falling" -> "fall", "hissing" -> "hiss",
    "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2 (+4/5 downstream)
    "relational" -> "relat", "rational" -> "ration",
    "conditional" -> "condit", "digitizer" -> "digit",
    "operator" -> "oper", "feudalism" -> "feudal",
    "hopefulness" -> "hope", "formalize" -> "formal",
    // step 3
    "electrical" -> "electr", "triplicate" -> "triplic",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "adjustable" -> "adjust",
    "adoption" -> "adopt", "activate" -> "activ", "effective" -> "effect",
    "replacement" -> "replac",
    // step 5
    "probate" -> "probat", "controll" -> "control", "roll" -> "roll")

  test("Porter vectors (paper examples, full pipeline)") {
    vectors.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want,
        s"stem($in) = ${PorterStemmer.stem(in)}, want $want")
    }
  }

  test("expression matches the driver-side engine (codegen path)") {
    val df = vectors.map(_._1).toDF("w")
      .withColumn("stem", TextOps.porterStem(col("w")))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { case (in, want) =>
      assert(got(in) == want, s"expr stem($in) = ${got(in)}, want $want")
    }
  }

  test("passthrough: short, non-alpha, uppercase folds, null-safe") {
    assert(PorterStemmer.stem("ab") == "ab")
    assert(PorterStemmer.stem("x1ing") == "x1ing") // non-alpha untouched
    assert(PorterStemmer.stem("don't") == "don't")
    assert(PorterStemmer.stem("Motoring") == "motor") // case-folds first
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "w")
      .withColumn("stem", TextOps.porterStem(col("w"))).collect()
    assert(r(0).isNullAt(1))
  }

  test("stemming collapses inflection families to one row (t63 shape)") {
    val docs = Seq(
      (1L, "connect connected connection connecting connections", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.Corpus.topStemsPerGroup(docs, "text", "lang", 3)
      .collect()
    assert(out.length == 1 && out(0).getAs[String]("stem") == "connect" &&
      out(0).getAs[Long]("n") == 5L)
  }
}
