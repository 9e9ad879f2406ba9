package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.CorpusStream

/** Gates for the t55 mergeable ε-rank quantile sketch (GK
  * QuantileSummaries via approx_percentile): the sketch has no SQL
  * mirror, so the CORRECTNESS row is rows-only and THESE are the
  * correctness contract — the ε-rank guarantee against exact order
  * statistics, invariance of the guarantee under different merge
  * trees (partitionings), and the streaming twin obeying the same
  * gate across micro-batches.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // one doc of k tokens => tokenCount k; values 1..n per group give
  // known exact order statistics (value v has exact rank v)
  private def docs(group: String, n: Int): Seq[(String, String)] =
    (1 to n).map(k => (group, Seq.fill(k)("w").mkString(" ")))

  private val quantiles = Seq(("p50_sk", 0.5), ("p90_sk", 0.9), ("p99_sk", 0.99))

  /** Assert every estimate's exact rank is within ε·n + 1 of the target
    * rank. Values are 1..n so rank(est) = est itself.
    */
  private def assertEps(
      got: Map[String, Seq[Long]], sizes: Map[String, Int],
      accuracy: Int, tag: String): Unit =
    got.foreach { case (g, ests) =>
      val n = sizes(g)
      quantiles.map(_._2).zip(ests).foreach { case (q, est) =>
        val target = q * n
        val tol = n.toDouble / accuracy + 1
        assert(est >= 1 && est <= n, s"$tag $g q=$q est=$est outside 1..$n")
        assert(math.abs(est - target) <= tol,
          s"$tag $g q=$q: est $est vs target $target exceeds eps tol $tol")
      }
    }

  private def estimates(df: DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r => r.getString(0) ->
      Seq(r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("sketchVocabPerGroup: HLL estimate within tolerance of exact " +
    "distinct, shard-union tracks the single-shard sketch (t64 gate)") {
    val corpus = (0 until 200).map { i =>
      val text = (0 until 20)
        .map(j => s"w${(i * 7 + j * 13) % 500}").mkString(" ")
      (i.toLong, text, s"l${i % 2}", s"s${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
    val est = Corpus.sketchVocabPerGroup(corpus, "text", "lang", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val exact = Corpus.vocabPerGroup(corpus, "text", "lang")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (g, (nShards, v)) =>
      assert(nShards == 3L, s"$g shards: $nShards")
      val ex = exact(g).toDouble
      assert(math.abs(v - ex) <= 0.05 * ex + 2,
        s"$g: sketch $v vs exact $ex")
    }
    // merge invariance: sharded-then-unioned ≈ one-shard sketch (the
    // mergeable-artifact contract — per-batch sketches must re-union to
    // what a monolithic pass would have published)
    val single = Corpus.sketchVocabPerGroup(
        corpus.withColumn("one", lit("x")), "text", "lang", "one")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    est.foreach { case (g, (_, v)) =>
      val s = single(g).toDouble
      assert(math.abs(v - s) <= 0.02 * math.max(s, 1.0) + 1,
        s"$g: union $v vs single $s")
    }
  }

  test("rankSketchQuantiles: epsilon-rank guarantee vs exact order " +
    "statistics at two accuracies, on uneven group sizes") {
    val data = (docs("en", 2000) ++ docs("de", 500)).toDF("lang", "text")
    val sizes = Map("en" -> 2000, "de" -> 500)
    for (acc <- Seq(100, 1000)) {
      val got = estimates(
        Corpus.rankSketchQuantiles(data, "text", "lang", accuracy = acc))
      assert(got.keySet == sizes.keySet)
      got.foreach { case (g, _) => () }
      // n_docs column is exact
      Corpus.rankSketchQuantiles(data, "text", "lang", accuracy = acc)
        .collect().foreach(r =>
          assert(r.getLong(1) == sizes(r.getString(0)).toLong))
      assertEps(got, sizes, acc, s"batch acc=$acc")
    }
  }

  test("rankSketchQuantiles: the guarantee is merge-invariant — any " +
    "partitioning (merge tree) of the same data stays within epsilon") {
    val data = (docs("en", 1500) ++ docs("de", 400)).toDF("lang", "text")
    val sizes = Map("en" -> 1500, "de" -> 400)
    for (parts <- Seq(1, 13)) {
      val got = estimates(Corpus.rankSketchQuantiles(
        data.repartition(parts), "text", "lang", accuracy = 200))
      assertEps(got, sizes, 200, s"parts=$parts")
    }
  }

  test("quantileSketchStream: the state store merges the GK buffer " +
    "across micro-batches and the finished estimates obey the same " +
    "epsilon gate as batch") {
    implicit val sqlCtx = spark.sqlContext
    val all = docs("en", 300) ++ docs("de", 120)
    val sizes = Map("en" -> 300, "de" -> 120)
    val src = MemoryStream[(String, String)]
    val q = CorpusStream.quantileSketchStream(
        src.toDF().toDF("lang", "text"), "text", "lang", accuracy = 200)
      .writeStream.format("memory").queryName("rank_sketch")
      .outputMode(OutputMode.Complete).start()
    try {
      val (b1, rest) = all.splitAt(100)
      val (b2, b3) = rest.splitAt(150)
      Seq(b1, b2, b3).foreach { b =>
        src.addData(b: _*); q.processAllAvailable()
      }
      val streamed = estimates(spark.table("rank_sketch"))
      assert(streamed.keySet == sizes.keySet)
      assertEps(streamed, sizes, 200, "streamed")
      spark.table("rank_sketch").collect().foreach(r =>
        assert(r.getLong(1) == sizes(r.getString(0)).toLong,
          "streamed n_docs must fold exactly"))
    } finally q.stop()
  }
}
