package graft.tools

import graft.SparkSpec

class EpochBuildSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 40L)
    .map(i => (i, Seq.fill((i % 5).toInt + 1)("w").mkString(" ")))
    .toDF("doc_id", "text")
  private def toksOf(i: Long): Long = (i % 5) + 1

  private lazy val epoch =
    EpochBuild.build(docs, "doc_id", "text", "epoch0",
      shardTokens = 12L, seqLen = 8, packShardDocs = 1000)

  test("order: every doc exactly once, dense positions, dense shards") {
    val rows = epoch.order.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("train_pos"), r.getAs[Long]("n_tok"),
      r.getAs[Long]("shard_id")))
    assert(rows.map(_._1).sorted.toSeq == (1L to 40L))
    assert(rows.map(_._2).sorted.toSeq == (0L until 40L))
    rows.foreach { case (id, _, n, _) => assert(n == toksOf(id)) }
    // shards are contiguous runs of the epoch order, filling to the
    // budget: non-decreasing in train_pos, dense ids, token totals
    // bounded by budget + max doc overflow
    val byPos = rows.sortBy(_._2)
    assert(byPos.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
    val shardIds = rows.map(_._4).distinct.sorted
    assert(shardIds.toSeq == (0L to shardIds.max))
    rows.groupBy(_._4).foreach { case (_, ss) =>
      assert(ss.map(_._3).sum <= 12L + 5L)
    }
  }

  test("boundaries: per-doc coverage and exact sequence tiling") {
    val b = epoch.boundaries.collect().map(r => (r.getAs[Long]("pack_shard"),
      r.getAs[Long]("seq_idx"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("start"), r.getAs[Long]("len")))
    val perDoc = b.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
    (1L to 40L).foreach(i => assert(perDoc(i) == toksOf(i)))
    b.groupBy(t => (t._1, t._2)).foreach { case (_, segs) =>
      val sorted = segs.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._4 + x._5 == y._4)
        case _ => ()
      }
      assert(sorted.map(_._5).sum <= 8L)
    }
  }

  test("bpeMerges: shard budgets and boundary tiling use the TRAINED " +
    "counts, which diverge from the heuristic") {
    import org.apache.spark.sql.functions.col
    // varied words so an empty merge table splits them into characters:
    // the trained counts genuinely differ from whitespace counts
    val vdocs = (1L to 12L)
      .map(i => (i, s"alpha bravo${i % 3} charlie delta echo".trim))
      .toDF("doc_id", "text")
    val merges = Seq.empty[(String, String)] // character-regime tokenizer
    val e = EpochBuild.build(vdocs, "doc_id", "text", "epochB",
      shardTokens = 40L, seqLen = 16, packShardDocs = 1000,
      bpeMerges = Some(merges))
    val want = vdocs.select(col("doc_id"),
        graft.ops.TextOps.bpeTokenCountTrained(col("text"), merges)
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val heur = vdocs.select(col("doc_id"),
        graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want != heur, "fixture must make the two counters disagree")
    val got = e.order.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tok")).toMap
    assert(got == want)
    // boundaries tile to the trained counts too
    val perDoc = e.boundaries.collect()
      .groupBy(_.getAs[Long]("doc_id")).view
      .mapValues(_.map(_.getAs[Long]("len")).sum).toMap
    assert(perDoc == want)
  }

  test("a rebuild is byte-identical; a new seed is a fresh permutation") {
    val again = EpochBuild.build(docs, "doc_id", "text", "epoch0",
      shardTokens = 12L, seqLen = 8, packShardDocs = 1000)
    assert(again.order.collect().toSet == epoch.order.collect().toSet)
    assert(again.boundaries.collect().toSet ==
      epoch.boundaries.collect().toSet)
    val other = EpochBuild.build(docs, "doc_id", "text", "epoch1",
      shardTokens = 12L, seqLen = 8, packShardDocs = 1000)
    val posA = epoch.order.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("train_pos")).toMap
    val posB = other.order.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("train_pos")).toMap
    assert(posA != posB)
  }

  test("write lays out per-epoch parquet readable round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("epoch").toString
    EpochBuild.write(epoch, dir, "epoch0")
    assert(spark.read.parquet(s"$dir/epoch=epoch0/order.parquet")
      .count() == 40L)
    assert(spark.read.parquet(s"$dir/epoch=epoch0/boundaries.parquet")
      .count() == epoch.boundaries.count())
    assert(spark.read.parquet(s"$dir/epoch=epoch0/manifest.parquet")
      .count() > 0)
  }

  test("manifest: per-shard totals reconcile; checksums are order-" +
    "sensitive and rebuild-stable") {
    val m = EpochBuild.manifest(epoch).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    val byShard = epoch.order.collect()
      .map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("n_tok")))
      .groupBy(_._1)
    assert(m.keySet == byShard.keySet)
    byShard.foreach { case (s, rows) =>
      assert(m(s)._1 == rows.length && m(s)._2 == rows.map(_._2).sum)
    }
    // a rebuild yields the identical manifest (the integrity use-case)
    val again = EpochBuild.manifest(EpochBuild.build(docs, "doc_id",
        "text", "epoch0", shardTokens = 12L, seqLen = 8,
        packShardDocs = 1000))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again == m.view.mapValues(_._3).toMap)
    // a different epoch order changes at least one shard checksum
    val other = EpochBuild.manifest(EpochBuild.build(docs, "doc_id",
        "text", "epoch1", shardTokens = 12L, seqLen = 8,
        packShardDocs = 1000))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(other != m.view.mapValues(_._3).toMap)
  }

  test("payload: id arrays align row-for-row with the order table's " +
    "trained counts") {
    import org.apache.spark.sql.functions.col
    val vdocs = (1L to 12L)
      .map(i => (i, s"alpha bravo${i % 3} charlie delta echo".trim))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "l"), ("al", "p"), ("alp", "h"), ("alph", "a"))
    val e = EpochBuild.build(vdocs, "doc_id", "text", "epochP",
      shardTokens = 40L, seqLen = 16, packShardDocs = 1000,
      bpeMerges = Some(merges))
    val pay = EpochBuild.payload(vdocs, "doc_id", "text", e, merges)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard_id"), r.getSeq[Int](3).length))).toMap
    val order = e.order.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard_id"), r.getAs[Long]("n_tok").toInt))).toMap
    assert(pay == order)
  }

  test("unigram budgets + payload: counts, shards, and ids align under " +
    "the trained pieces") {
    import org.apache.spark.sql.functions.col
    val vdocs = (1L to 12L)
      .map(i => (i, s"alpha bravo${i % 3} charlie delta echo".trim))
      .toDF("doc_id", "text")
    val m = graft.ops.UnigramTokenizer.train(vdocs, "text", vocabSize = 12)
    val e = EpochBuild.build(vdocs, "doc_id", "text", "epochU",
      shardTokens = 40L, seqLen = 16, packShardDocs = 1000,
      unigramPieces = Some(m.pieces))
    val want = vdocs.select(col("doc_id"),
        graft.ops.TextOps.unigramTokenCount(col("text"), m.pieces)
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = e.order.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tok")).toMap
    assert(got == want)
    val pay = EpochBuild.payloadUnigram(vdocs, "doc_id", "text", e, m.pieces)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Int](3).length).toMap
    assert(pay == want.view.mapValues(_.toInt).toMap)
    // one tokenizer at a time
    intercept[IllegalArgumentException] {
      EpochBuild.build(vdocs, "doc_id", "text", "epochX", 40L, 16,
        bpeMerges = Some(Seq(("a", "b"))),
        unigramPieces = Some(m.pieces))
    }
  }

  test("byte-level budgets + payload: counts, shards, and ids align " +
    "under the trained byte merges, decode reproduces the exact bytes") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{ByteBpeVocab, BytePretok}
    // multilingual rows the alpha-run tokenizer cannot represent
    val vdocs = ((1L to 10L)
      .map(i => (i, s"alpha bravo${i % 3} charlie delta echo")) ++
      Seq((11L, "日本語のテキスト and emoji 🍜🔥"),
        (12L, "naïve café résumé")))
      .toDF("doc_id", "text")
    val merges = graft.ops.TextOps.trainByteBpeMerges(
      vdocs, "text", nMerges = 80)
    val e = EpochBuild.build(vdocs, "doc_id", "text", "epochB",
      shardTokens = 60L, seqLen = 16, packShardDocs = 1000,
      byteBpeMerges = Some(merges))
    val want = vdocs.select(col("doc_id"),
        graft.ops.TextOps.byteBpeTokenCount(col("text"), merges)
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = e.order.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tok")).toMap
    assert(got == want)
    val pay = EpochBuild.payloadByteBpe(vdocs, "doc_id", "text", e, merges)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Int](3)).toMap
    assert(pay.view.mapValues(_.length.toLong).toMap == want)
    // total decode: the payload reconstructs every doc's exact bytes
    val table = ByteBpeVocab.decodeTable(merges)
    val texts = vdocs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    pay.foreach { case (id, ids) =>
      assert(BytePretok.fromSymbols(ids.map(table).mkString) == texts(id))
    }
  }
}
