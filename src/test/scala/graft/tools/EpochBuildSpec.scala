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

class EpochDeltaSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  // standing corpus 1..40, appended batch 100..119; packShardDocs = 13
  // (prime, not dividing 40) forces the delta to ENTER a partially
  // filled boundary pack shard, and shardTokens = 11 with ragged doc
  // lengths leaves the base's last token shard partially filled
  private val standing = (1L to 40L)
    .map(i => (i, Seq.fill((i % 5).toInt + 1)("w").mkString(" ")))
    .toDF("doc_id", "text")
  private val batch = (100L to 119L)
    .map(i => (i, Seq.fill((i % 4).toInt + 1)("w").mkString(" ")))
    .toDF("doc_id", "text")
  private val appended = standing.unionByName(batch)

  private lazy val base = EpochBuild.build(standing, "doc_id", "text",
    "epoch0", shardTokens = 11L, seqLen = 8, packShardDocs = 13)
  private lazy val delta = EpochBuild.deltaBuild(base.order, batch,
    "doc_id", "text", "epoch0", shardTokens = 11L, seqLen = 8,
    packShardDocs = 13)

  test("base + delta ≡ from-scratch build of the appended corpus under " +
    "the append-ordered permutation") {
    // the appended-epoch permutation: standing positions FROZEN (a
    // mid-training reader has consumed a prefix), batch docs seeded
    // among themselves after N. From scratch = that order fed through
    // the same global prefix-sum shard cut and per-shard packing.
    val fullOrder = base.order.select("doc_id", "train_pos", "n_tok")
      .unionByName(
        graft.ops.Corpus.seededShuffle(batch.select("doc_id"), "doc_id",
            "epoch0")
          .withColumn("train_pos", col("train_pos") + 40L)
          .join(batch.select(col("doc_id"),
            graft.ops.TextOps.tokenCount(col("text")).cast("long")
              .as("n_tok")), "doc_id")
          .select("doc_id", "train_pos", "n_tok"))
    val fullSharded = graft.ops.Corpus.budgetShards(
        fullOrder, Seq("train_pos"), "n_tok", 11L)
      .select("doc_id", "train_pos", "n_tok", "shard_id")
    val gotOrder = base.order.unionByName(delta.order)
    assert(gotOrder.collect().map(_.toSeq).toSet ==
      fullSharded.collect().map(_.toSeq).toSet)

    val fullBounds = graft.ops.Packing.chunkBoundariesFromCounts(
        fullOrder.select(col("train_pos").as("id"), col("n_tok")),
        budget = 8, shardDocs = 13)
      .withColumnRenamed("shard", "pack_shard")
      .withColumnRenamed("doc_id", "train_pos")
      .join(fullOrder.select("doc_id", "train_pos"), "train_pos")
      .select("pack_shard", "seq_idx", "doc_id", "start", "len")
    val gotBounds = base.boundaries.unionByName(delta.boundaries)
    assert(gotBounds.collect().map(_.toSeq).toSet ==
      fullBounds.collect().map(_.toSeq).toSet)
  }

  test("delta continues the base's partially filled token shard and the " +
    "boundary pack shard's tail sequence") {
    val baseRows = base.order.collect()
    val baseLastShard = baseRows.map(_.getAs[Long]("shard_id")).max
    val baseTokens = baseRows.map(_.getAs[Long]("n_tok")).sum
    // crafted so the base total is NOT a multiple of the budget: the
    // first delta doc must land in the base's final shard
    assert(baseTokens % 11L != 0L, s"fixture degenerate: $baseTokens")
    val deltaRows = delta.order.collect()
    val firstDelta = deltaRows.minBy(_.getAs[Long]("train_pos"))
    assert(firstDelta.getAs[Long]("shard_id") == baseLastShard)
    // positions are the standing tail continuation
    assert(deltaRows.map(_.getAs[Long]("train_pos")).sorted.toSeq ==
      (40L until 60L))
    // the shared boundary pack shard (40 div 13 = 3) continues: the
    // delta's first sequence index there is >= the base's last
    val sb = 40L / 13L
    val baseMaxSeq = base.boundaries.filter(col("pack_shard") === sb)
      .collect().map(_.getAs[Long]("seq_idx")).max
    val deltaMinSeq = delta.boundaries.filter(col("pack_shard") === sb)
      .collect().map(_.getAs[Long]("seq_idx")).min
    assert(deltaMinSeq >= baseMaxSeq,
      s"delta must continue, not restart: base max $baseMaxSeq, " +
        s"delta min $deltaMinSeq")
  }

  test("deltaBuild is deterministic (byte-identical on a re-run)") {
    val again = EpochBuild.deltaBuild(base.order, batch, "doc_id", "text",
      "epoch0", shardTokens = 11L, seqLen = 8, packShardDocs = 13)
    assert(delta.order.collect().map(_.toSeq).toSet ==
      again.order.collect().map(_.toSeq).toSet)
    assert(delta.boundaries.collect().map(_.toSeq).toSet ==
      again.boundaries.collect().map(_.toSeq).toSet)
  }

  test("manifest totals over base + delta reconcile with the appended " +
    "corpus (boundary shard merges by addition)") {
    val merged = EpochBuild.manifest(base).select("shard_id", "n_docs",
        "n_tokens")
      .unionByName(EpochBuild.manifest(delta).select("shard_id", "n_docs",
        "n_tokens"))
      .groupBy("shard_id")
      .agg(org.apache.spark.sql.functions.sum("n_docs").as("n_docs"),
        org.apache.spark.sql.functions.sum("n_tokens").as("n_tokens"))
      .collect()
    assert(merged.map(_.getAs[Long]("n_docs")).sum == 60L)
    val wantTok = appended.select(
      graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(_.getLong(0)).sum
    assert(merged.map(_.getAs[Long]("n_tokens")).sum == wantTok)
  }
}
