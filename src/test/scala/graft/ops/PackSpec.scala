package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the rows-only packing / corpus-prep operators. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 20
  private val shard = 8

  // docs with token counts 1..7 repeating; one oversized doc (id 50)
  private lazy val docs = ((0L until 50L).map { i =>
    (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" "))
  } :+ (50L, Seq.fill(30)("w").mkString(" "))).toDF("doc_id", "text")

  private lazy val assign =
    Packing.greedyPack(spark, docs, "doc_id", "text", budget, shard)

  test("greedyPack covers every document exactly once") {
    val got = assign.select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L to 50L))
  }

  test("greedyPack respects the budget except for single oversized docs") {
    val bins = assign.groupBy("shard", "bin_idx")
      .agg(sum("n_tok").as("tot"), count(lit(1)).as("n"))
      .collect()
    bins.foreach { r =>
      val (tot, n) = (r.getAs[Long]("tot"), r.getAs[Long]("n"))
      assert(tot <= budget || n == 1L,
        s"bin over budget with $n docs, $tot tokens")
    }
    // the oversized doc is alone in its bin
    val over = assign.filter(col("id") === 50L).collect().head
    val mates = assign.filter(col("shard") === over.getAs[Long]("shard") &&
      col("bin_idx") === over.getAs[Long]("bin_idx")).count()
    assert(mates == 1L)
  }

  test("greedyPack is deterministic across runs and repartitionings") {
    val a = assign.orderBy("shard", "bin_idx", "id").collect().toSeq
    val b = Packing.greedyPack(spark, docs.repartition(7), "doc_id", "text",
      budget, shard).orderBy("shard", "bin_idx", "id").collect().toSeq
    assert(a == b)
  }

  test("greedyPack docs never cross shards") {
    assert(assign.filter(expr(s"shard <> id DIV $shard")).count() == 0L)
  }

  test("chunkPack conserves tokens and splits at exact budget boundaries") {
    val out = Packing.chunkPack(docs, "doc_id", "text", budget, shard)
    val totalTokens = out.agg(sum("n_tokens")).as[Long].collect().head
    assert(totalTokens == (0L until 50L).map(i => (i % 7) + 1).sum + 30)
    // within a shard, sequences are contiguous doc-id ranges:
    // seq k's last_doc < seq k+1's first_doc
    val rows = out.orderBy("shard", "seq_idx")
      .select("shard", "seq_idx", "first_doc", "last_doc")
      .as[(Long, Long, Long, Long)].collect()
    rows.sliding(2).foreach {
      case Array((s1, _, _, last), (s2, _, first, _)) if s1 == s2 =>
        assert(last < first || last == first,
          "sequences within a shard must cover non-overlapping id ranges " +
            "(a doc straddling a boundary belongs to the seq of its first token)")
      case _ => ()
    }
  }

  test("chunkBoundaries: mask segments tile each sequence exactly") {
    val out = Packing.chunkBoundaries(docs, "doc_id", "text", budget, shard)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_idx"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("start"),
        r.getAs[Long]("len")))
    // every document's segments sum to its token count
    val perDoc = out.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
    (0L until 50L).foreach(i => assert(perDoc(i) == (i % 7) + 1))
    assert(perDoc(50L) == 30L)
    // segments within a (shard, seq) tile it: starts/lens are disjoint,
    // contiguous from 0, and only the stream's last seq may end short
    out.groupBy(t => (t._1, t._2)).foreach { case (_, segs) =>
      val sorted = segs.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4)
        case _ => ()
      }
      assert(sorted.map(_._5).sum <= budget)
    }
    // an oversized doc (30 tokens > budget 20) spans >= 2 sequences
    assert(out.count(_._3 == 50L) >= 2)
  }

  test("splitLabel is a deterministic pure function of the id") {
    val s1 = Corpus.splitSummary(docs, "doc_id", "text")
      .orderBy("split").collect().toSeq
    val s2 = Corpus.splitSummary(docs.repartition(5), "doc_id", "text")
      .orderBy("split").collect().toSeq
    assert(s1 == s2)
    val labels = docs.select(Corpus.splitLabel(col("doc_id"))).distinct()
      .as[String].collect().toSet
    assert(labels.subsetOf(Set("train", "val", "test")))
  }

  test("heavyHitters ranks by count then token") {
    val hh = Corpus.heavyHitters(
      Seq("a a a b b c", "b c c d").toDF("text"), "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(hh == Seq(("a", 3L), ("b", 3L), ("c", 3L)))
  }

  test("crossJaccard finds cross-relation pairs without an id-order constraint") {
    val left = Seq((10L, "a b c d"), (11L, "x y z w")).toDF("doc_id", "text")
    val right = Seq((1L, "a b c d"), (2L, "p q r s")).toDF("doc_id", "text")
    val pairs = Dedup.crossJaccard(left, right, "text", "doc_id", 1, 2)
      .as[(Long, Long, Double)].collect().toSeq
    // id_a (10) > id_b (1): nGramJaccard's a<b rule must NOT apply here
    assert(pairs == Seq((10L, 1L, 1.0)))
  }

  test("decontaminate returns only train-test pairs") {
    val labeled = (0L until 40L).map(i => (i, s"tok$i filler common words"))
    val df = (labeled :+ (100L, "shared shared text here")
      :+ (101L, "shared shared text here")).toDF("doc_id", "text")
    val out = Corpus.decontaminate(df, "doc_id", "text", 1, 2)
    val lab = df.select(col("doc_id"), Corpus.splitLabel(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    out.as[(Long, Long, Double)].collect().foreach { case (tr, te, _) =>
      assert(lab(tr) == "train" && lab(te) == "test")
    }
  }

  test("topTokensPerGroup ranks within each group independently") {
    val df = Seq(("en", "a a b"), ("en", "a c"), ("fr", "z z q"))
      .toDF("lang", "text")
    val out = Corpus.topTokensPerGroup(df, "text", "lang", 2)
      .orderBy("lang", "rk")
      .as[(String, String, Long, Int)].collect().toSeq
    assert(out == Seq(("en", "a", 3L, 1), ("en", "b", 1L, 2),
      ("fr", "z", 2L, 1), ("fr", "q", 1L, 2)))
  }

  test("repetitionScores: top-token share and duplicate-bigram fraction") {
    val df = Seq((1L, "a a a b"), (2L, "x y z")).toDF("doc_id", "text")
    val r = Corpus.repetitionScores(df, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Int, Long, Double, Int, Double)].collect().toSeq
    // doc 1: 4 tokens, top "a"x3; bigrams [a a, a a, a b] -> 2 distinct of 3
    assert(r(0) == ((1L, 4, 3L, 0.75, 2, 1.0 - 2.0 / 3)))
    // doc 2: no repetition at all
    assert(r(1) == ((2L, 3, 1L, 1.0 / 3, 2, 0.0)))
  }

  test("stratifiedSample: per-stratum hash fractions, deterministic") {
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val gone = Corpus.stratifiedSample(df, "doc_id", "lang", Map("en" -> 0))
    assert(gone.filter(col("lang") === "en").count() == 0)
    assert(gone.filter(col("lang") === "fr").count() == 100) // default 16/16
    val once = Corpus.stratifiedSample(df, "doc_id", "lang", Map("en" -> 4))
      .filter(col("lang") === "en").as[(Long, String)].collect().toSet
    val again = Corpus.stratifiedSample(df, "doc_id", "lang", Map("en" -> 4))
      .filter(col("lang") === "en").as[(Long, String)].collect().toSet
    assert(once == again && once.nonEmpty && once.size < 100)
  }

  test("quotaSample: exact counts per stratum, partition-independent") {
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    def res(parts: Int): Set[(Long, String)] =
      Corpus.quotaSample(df.repartition(parts), "doc_id", "lang",
          Map("en" -> 7, "fr" -> 11), defaultQuota = 0)
        .as[(Long, String)].collect().toSet
    val one = res(1)
    assert(one.count(_._2 == "en") == 7 && one.count(_._2 == "fr") == 11)
    // the bounded-heap phase must not depend on how rows are partitioned
    assert(res(7) == one && res(32) == one)
    // quota above stratum size -> whole stratum; unlisted stratum dropped
    val big = Corpus.quotaSample(df, "doc_id", "lang", Map("en" -> 1000))
      .as[(Long, String)].collect()
    assert(big.count(_._2 == "en") == 100 && !big.exists(_._2 == "fr"))
  }

  test("mixtureUpsample: whole epochs exact, fractional epochs stable") {
    val df = (0L until 400L)
      .map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "source")
    // a: exactly 2 epochs; b: 0.5 epochs decided by a per-doc hash byte
    val out = Corpus.mixtureUpsample(df, "doc_id", "source",
      Map("a" -> 512, "b" -> 128), default256 = 256)
    val byDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"))
      .as[(Long, String, Long, Long)].collect()
    val aDocs = byDoc.filter(_._2 == "a")
    assert(aDocs.length == 200 && aDocs.forall(d => d._3 == 2L && d._4 == 2L))
    val bDocs = byDoc.filter(_._2 == "b")
    assert(bDocs.forall(d => d._3 == 1L)) // kept b docs appear exactly once
    // ~half of the 200 b docs survive, deterministically
    assert(bDocs.length > 60 && bDocs.length < 140)
    val again = Corpus.mixtureUpsample(df, "doc_id", "source",
      Map("a" -> 512, "b" -> 128)).count()
    assert(again == out.count())
    // zero weight drops the stratum entirely
    assert(Corpus.mixtureUpsample(df, "doc_id", "source", Map("b" -> 0))
      .filter(col("source") === "b").count() == 0)
  }

  test("distinctiveTokensPerGroup scores lift against the whole corpus") {
    val df = Seq(("en", "aa aa bb"), ("fr", "bb bb cc")).toDF("lang", "text")
    val out = Corpus.distinctiveTokensPerGroup(df, "text", "lang", 2, 1L)
      .select("lang", "token", "tf", "lift", "rk")
      .as[(String, String, Long, Double, Int)].collect().toSet
    // totals: en=3, fr=3, corpus=6; aa: tc=2, bb: tc=3, cc: tc=1
    assert(out == Set(
      ("en", "aa", 2L, 2.0, 1), ("en", "bb", 1L, 6.0 / 9, 2),
      ("fr", "cc", 1L, 2.0, 1), ("fr", "bb", 2L, 12.0 / 9, 2)))
    // minDf prunes rare tokens before ranking
    val pruned = Corpus.distinctiveTokensPerGroup(df, "text", "lang", 2, 2L)
      .select("token").as[String].collect().toSet
    assert(pruned == Set("aa", "bb"))
  }

  test("tokenStats median matches linear interpolation") {
    val ts = Corpus.tokenStats(
      Seq(("x", "a"), ("x", "a b"), ("x", "a b c"), ("x", "a b c d"))
        .toDF("lang", "text"), "text", "lang")
      .select("n_docs", "min_tokens", "max_tokens", "median_tokens")
      .as[(Long, Int, Int, Double)].collect().head
    assert(ts == ((4L, 1, 4, 2.5)))
  }
}
