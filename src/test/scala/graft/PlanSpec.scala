package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape assertions (SURVEY §5/§6): filters and projections must reach
  * the parquet scan, small dimensions must broadcast, and pairwise ops must
  * not contain a bare cartesian product over the full input.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("driver smoke contract: entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01: column pruning reaches the scan (ReadSchema is minimal)") {
    val p = plan("q01_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate") &&
      !read.contains("l_quantity"))
  }

  test("q02: conjunctive predicates are pushed to the parquet scan") {
    val p = plan("q02_filter_range")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("GreaterThanOrEqual(l_quantity"))
    assert(pushed.contains("EqualTo(l_returnflag"))
    assert(pushed.contains("IsNotNull"))
  }

  test("q03: string equality filter pushed") {
    val p = plan("q03_filter_string")
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("EqualTo(o_orderpriority,1-URGENT)")))
  }

  test("q05: dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("q05_join3")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q06: 4-way join keeps filter pushdown and broadcasts nation") {
    val p = plan("q06_join4_filter_sort")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("GreaterThan(o_totalprice")))
  }

  test("q07: non-equi join is a broadcast nested loop, not a cartesian") {
    val p = plan("q07_nonequi_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q10: aggregation is partial (map-side) before the shuffle") {
    val p = plan("q10_groupby_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count") ||
      p.contains("Partial"))
  }

  test("q14: compiled SPJ dialect broadcasts small relations and pushes literals") {
    val p = plan("q14_spj_sql")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("LessThan(o_totalprice")))
  }

  test("q32: compiled 4-way SPJ chain broadcasts dims and pushes the range") {
    val p = plan("q32_spj_chain")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("GreaterThan(o_totalprice")))
    assert(!p.contains("CartesianProduct"))
  }

  test("s07: the metadata predicate of filtered search reaches the scan") {
    val p = plan("s07_knn_filtered")
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("EqualTo(label,2)")))
  }

  test("d17: window strings never shuffle (hashes in the scan stage)") {
    // the span index shuffles (id, pos, h1, h2) fixed-width rows; the
    // n-token window text must be consumed by xxhash64 inside the scan
    // stage and appear in NO exchange input
    val lines = plan("d17_scrub_spans").linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty)
    exchangeInputs.foreach { in =>
      assert(!in.contains("w#"), s"exchange shuffles window text: $in")
    }
  }

  test("d25: maximal-span scrub keeps d17's fixed-width exchanges (no " +
    "window text in any exchange, no cartesian; the islands window " +
    "runs over hot hits only)") {
    val p = plan("d25_scrub_maxspans")
    assert(!p.contains("CartesianProduct"))
    val lines = p.linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty)
    exchangeInputs.foreach { in =>
      assert(!in.contains("w#"), s"exchange shuffles window text: $in")
    }
  }

  test("d43: paragraph text crosses NO hash-keyed exchange — the md5 " +
    "index shuffles fixed-width rows; text moves only in the id-keyed " +
    "docs-side removal join; no cartesian") {
    val p = plan("d43_paragraph_bloom")
    assert(!p.contains("CartesianProduct"))
    val lines = p.linesIterator.toSeq
    val exchanges = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (l, i) =>
        (l, lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse(""))
      }
    assert(exchanges.nonEmpty)
    exchanges.foreach { case (ex, in) =>
      // the paragraph string column (para#/ps#) may ride ONLY an
      // exchange partitioned on the doc id — never the h-keyed ones
      if (in.contains("para#") || in.contains("ps#"))
        assert(ex.contains("partitioning(id#") ||
          ex.contains("partitioning(doc_id#"),
          s"paragraph text in a non-id exchange: $ex :: $in")
    }
  }

  test("t34: BM25 broadcasts the query terms (no shuffle keyed on the " +
    "tiny side) and has no cartesian beyond the single-row stats join") {
    val p = plan("t34_bm25_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e19: both SCD2 windows share ONE user_id exchange and sort " +
    "(filter preserves the child ordering — the e17 lesson)") {
    val p = SparkEntry.queries("e19_scd2_history")(spark, dir)
      .queryExecution.executedPlan.toString
    val exch = p.linesIterator.count(_.contains("hashpartitioning(user_id"))
    assert(exch == 1, s"expected 1 user_id exchange, got $exch:\n$p")
  }

  test("t35: KN scoring joins are all equi/broadcast — no cartesian " +
    "beyond the single-row ntot, stats tables partial-aggregate") {
    val p = plan("t35_kn_bigram")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p) // the one-row ntot attach
    assert(p.contains("HashAggregate"))
  }

  test("p25: weighted sample is TakeOrderedAndProject (per-partition " +
    "bounded heaps), never a global sort — the q30/p16 shape") {
    val p = plan("p25_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    // no range-partitioned global sort anywhere in the draw
    assert(!p.contains("rangepartitioning"), p)
  }

  test("p12: composed pipeline has no cartesian and dedups via ONE window") {
    val p = plan("p12_curation_pipeline")
    assert(!p.contains("CartesianProduct"))
    // the inline exact-dedup: exactly one Window node (the content-hash
    // min), not a join back to a re-derived pipeline branch
    assert("\\(\\d+\\) Window".r.findAllIn(p).size == 1, p)
  }

  test("e12: both windows and the final agg share ONE user_id exchange") {
    // row_number + count windows and the groupBy all key on user_id —
    // the truncation filter must not cost a second shuffle. Expect
    // exactly 2 Exchanges: the shared hashpartitioning(user_id) and the
    // final presentation orderBy's rangepartitioning
    val p = plan("e12_user_sequences")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 2, p)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1)
  }

  test("d02: inverted-index jaccard has no cartesian product") {
    val p = plan("d02_dedup_jaccard")
    assert(!p.contains("CartesianProduct"))
  }

  test("d20: coverage joins on gram hashes — semi join, no cartesian, no text exchange") {
    val lines = plan("d20_ngram_coverage").linesIterator.toSeq
    val p = lines.mkString("\n")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftSemi"))
    // no HASH shuffle (join/agg) may carry document text — only the
    // fixed-width (id, hash) rows; the small-SF spreadIfNarrow
    // round-robin spread is exempt (a no-op at cluster scale)
    val hashExchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        val in = lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
        val args = lines.drop(i + 1).find(_.trim.startsWith("Arguments"))
          .getOrElse("")
        (in, args)
      }
      .filter(_._2.contains("hashpartitioning"))
    assert(hashExchangeInputs.nonEmpty)
    hashExchangeInputs.foreach { case (in, _) =>
      assert(!in.contains("text#"), s"hash exchange shuffles text: $in")
    }
  }

  test("d21: eval side broadcasts; the train side is never exchanged before scoring") {
    val p = plan("d21_semantic_decontaminate")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
  }

  test("p17: within-source ranks use the prefix-sum machinery, not a per-source window") {
    // a window partitioned by source = one task per source = straggler;
    // the only windows allowed are the numPartitions-row offset prefix
    // sums inside contiguousIdsBy
    val p = plan("p17_mixture_order")
    assert(!p.contains("windowspecdefinition(source"),
      "per-source window found — the straggler shape mixtureOrder exists to avoid")
    assert(!p.contains("CartesianProduct"))
  }

  test("d03: LSH banding joins on bucket keys, no nested-loop over docs") {
    val p = plan("d03_dedup_minhash")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("s01: probe side is broadcast for the scoring join") {
    val p = plan("s01_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("s09: bounded hard negatives join on list keys — NO cartesian") {
    // r8: s08's scale path must never degrade to the exact baseline's
    // crossJoin shape — candidates come from the IVF list equi-join, the
    // label inequality is a post-join filter
    val p = plan("s09_hard_negatives_ivf")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("dot product is the native codegen expression") {
    val p = plan("d05_dedup_embedding")
    // per-pair math must be graft_dot; lambdas remain only in the cheap
    // per-row quantize step
    assert(p.contains("graft_dot"))
  }

  test("d01: no exchange carries the document text (hash at scan, shuffle hash+id)") {
    // formatted explain prints each Exchange node followed by an
    // "Input [n]: [cols]" line — none of them may carry the text column
    val lines = plan("d01_dedup_exact").linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty) // the groupBy's own exchange
    exchangeInputs.foreach { in =>
      assert(!in.contains("text#"), s"exchange shuffles full text: $in")
    }
  }

  test("s02: corpus-side bucket hashing is the native SignPack, not HOF lambdas") {
    val p = plan("s02_knn_lsh")
    assert(p.contains("graft_signpack"))
    // the old formulation evaluated aggregate(zip_with(...)) per plane per
    // corpus row, interpreted; only the cheap per-row quantize transform
    // may remain as a lambda
    assert(!p.contains("zip_with"))
  }

  test("e14: salted sequence trim windows partition by (user_id, chunk)") {
    // r8: the phase-1 row_number must key on the time chunk (the skew
    // guard) — a bare user_id window would mean the salting is inert
    val p = plan("e14_user_sequences_salted")
    assert(p.contains("windowspecdefinition(user_id") && p.contains("chunk"))
    assert(!p.contains("CartesianProduct"))
  }

  test("e03: salted sessionization windows partition by (user_id, chunk)") {
    val p = plan("e03_sessionize_salted")
    // phase-1 window key includes the time chunk — the skew guard at scale
    assert(p.contains("chunk"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t06: heavy hitters top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("t06_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"))
    // and the count aggregation is partial before its shuffle
    assert(p.contains("partial_count") || p.contains("Partial"))
  }

  test("p01: split assignment plans with no exchange before the aggregation") {
    // the md5 label is a pure projection — the summary groupBy's exchange
    // carries only (split, n_tok), never the text column
    val lines = plan("p01_split_assign").linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    exchangeInputs.foreach { in =>
      assert(!in.contains("text#"), s"exchange shuffles full text: $in")
    }
  }

  test("p02: chunk packing shuffles fixed-width rows only (no text)") {
    val lines = plan("p02_pack_chunk").linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty) // the shard window's exchange
    exchangeInputs.foreach { in =>
      assert(!in.contains("text#"), s"exchange shuffles full text: $in")
    }
  }

  test("e04: as-of join is union+window, never a range nested loop") {
    val p = plan("e04_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("e05: lookback count is an equi join on (key, bucket)") {
    val p = plan("e05_funnel_count")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
  }

  test("t08: repetition is a fused scan-stage map (no explode, no agg)") {
    val p = plan("t08_repetition")
    val lines = p.linesIterator.toSeq
    // r4: TokenStatsExpr fuses all three counts into one per-doc pass —
    // the plan must contain no Generate (explode) and no aggregation; the
    // only exchange left is the final sort's, carrying narrow rows
    assert(p.contains("graft_token_stats"))
    assert(!p.contains("Generate") && !p.contains("HashAggregate"))
    // the fused expression must be evaluated exactly once (CollapseProject
    // / predicate pushdown must not have duplicated it per struct field)
    assert("graft_token_stats".r.findAllIn(p).size == 1, p)
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty)
    exchangeInputs.foreach { in =>
      assert(!in.contains("text#"), s"exchange shuffles full text: $in")
    }
  }

  test("q21: rollup expands grouping sets before ONE partial aggregation") {
    val p = plan("q21_rollup")
    assert(p.contains("Expand"))
    // one exchange for the aggregation, one for the final sort — never a
    // scan or aggregation per rollup level
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("e07: hopping windows expand per-event, no self-join") {
    val p = plan("e07_hopping_window")
    assert(p.contains("Expand") || p.contains("Generate"))
    assert(!p.contains("Join"), "hopping windows must not plan as a join")
  }

  test("q20: set ops plan as joins over distinct keys, no cartesian") {
    val p = plan("q20_intersect_except")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join")) // intersect/except lowered to semi/anti joins
  }

  test("q23: aggregate window frame is one running scan, not a self-join") {
    val p = plan("q23_moving_window")
    assert(p.contains("Window"))
    assert(!p.contains("Join"), "frame aggregates must not plan as a join")
    // one exchange partitions by o_custkey, one serves the final sort
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("p06: quota sampling never window-sorts the full corpus") {
    val p = plan("p06_quota_sample")
    // phase 1 is partition-local (mapPartitions): at most two exchanges
    // remain — survivors into the per-stratum rank, then the final sort
    assert(p.contains("MapPartitions"))
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("e10: salted as-of join stays windows + equi joins (no range loop)") {
    val p = plan("e10_asof_salted")
    assert(p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("s04/d10: k-means assignment is a fused map, never an N×k loop join") {
    // r5: graft_nearest_centroid(s) replaced the corpus × broadcast(k)
    // scoring join + per-id window argsort — the plan must contain the
    // fused expression and no nested-loop/cartesian row blow-up
    Seq("s04_kmeans", "s03_knn_ivf").foreach { q =>
      val p = plan(q)
      assert(p.contains("graft_nearest_centroid"), q)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), q)
    }
    // d10's query default eagerly materializes the assignment frame (r15 —
    // nine sibling subtrees re-ran the fused argmin lazily), truncating
    // explain to a Scan ExistingRDD; pin the DECLARATIVE plan the op
    // builds (the chi2Outliers checkpoint=false convention)
    val d10 = graft.ops.VectorOps.semanticDedup(
      graft.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
      k = 10, iters = 3, tau = 0.4, nAssign = 3, materialize = false)
    val pd = d10.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    assert(pd.contains("graft_nearest_centroid"), pd.take(2000))
    assert(!pd.contains("BroadcastNestedLoopJoin") &&
      !pd.contains("CartesianProduct"), "d10")
  }

  test("q24: NOT IN runs as a null-aware broadcast anti join, not a loop") {
    val p = plan("q24_not_in_null")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
    // the second flag of HashedRelationBroadcastMode is isNullAware — the
    // 3VL machinery lives in the hashed relation, not a nested loop
    assert("HashedRelationBroadcastMode\\(List\\([^)]*\\),true\\)".r
      .findFirstIn(p).isDefined)
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("d02/d07: every equi-join keys on gram hashes (no sizes join on id)") {
    // late r5: gram-set sizes come from size() in the scan stage; the old
    // shape aggregated the exploded index by id and joined it back,
    // re-exchanging every gram row (d07 5.74 -> 0.94 s). Guard: the only
    // equi-joins left key on the gram hash, never bare id.
    Seq("d02_dedup_jaccard", "d07_decontaminate").foreach { q =>
      val p = plan(q)
      val keyLines = p.linesIterator.filter(_.startsWith("Left keys")).toSeq
      assert(keyLines.nonEmpty, q)
      assert(keyLines.forall(_.contains("gh")), s"$q: $keyLines")
    }
  }

  test("q25: explicit pivot values keep the two-level aggregate shape") {
    val p = plan("q25_pivot")
    // pivot rewrites to an inner (day, type) count + an outer PivotFirst
    // — 2 logical aggregates = 4 physical (partial+final each), ONE raw
    // data pass. Explicit values also mean no distinct-discovery job runs
    // before planning (that job is invisible to the plan, but a values
    // regression would show as extra aggregates here).
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) HashAggregate")) == 4)
    assert(p.contains("pivotfirst"))
  }

  test("q27: cube expands grouping sets before ONE partial aggregation") {
    val p = plan("q27_cube")
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Expand")) == 1)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Exchange")) <= 2)
  }

  test("q31: EXISTS/NOT EXISTS decorrelate to one semi + one anti join") {
    val p = plan("q31_exists_subquery")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
    // the correlated non-equi conjunct folds into the join condition
    // instead of forcing a per-row re-scan or nested loop
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q30: top-k is TakeOrderedAndProject, never a global sort") {
    val p = plan("q30_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q26: LIKE prefix and contains are pushed into the parquet scan") {
    val p = plan("q26_like_prefix")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("StringStartsWith(p_type,STAND"))
    assert(pushed.contains("StringContains(p_name,bolt"))
  }

  test("spreadIfNarrow: already-wide inputs pass through with NO exchange") {
    // r6 (r5 verdict #1): the dedup/vector preambles must spread only
    // narrow sources — a pre-partitioned (cluster-scale) input must not
    // pay a full-text exchange before the fused signature projection.
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wide = Tables.load(spark, dir, "documents").repartition(target)
    // identity, not a new plan node:
    assert(graft.Tables.spreadIfNarrow(wide) eq wide)
    // whole-plan check: the only Exchange is the input's own repartition —
    // the signature op itself adds none below the gram/sig projection
    Seq(
      graft.ops.Dedup.minHashSignatures(wide, "text", "doc_id", 8),
      graft.ops.Dedup.simHashes(wide, "text", "doc_id")
    ).foreach { sig =>
      val p = sig.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, p)
    }
    // and a narrow (single-file, one-partition) source still gets spread
    val narrow = Tables.load(spark, dir, "documents")
    assert(narrow.rdd.getNumPartitions < target)
    assert(Tables.spreadIfNarrow(narrow).rdd.getNumPartitions == target)
  }

  test("p07: the only window runs over per-partition COUNTS, not the corpus") {
    val p = plan("p07_global_ids")
    // exactly one Window node, and it consumes the numPartitions-row
    // count aggregate (input = pid/cnt), broadcast back to the data —
    // the corpus itself is never globally sorted through one task
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window")) == 1)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("p13: seeded shuffle inherits p07's no-global-window shape") {
    val p = plan("p13_seeded_shuffle")
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window")) == 1)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("p14: shard assignment's only window runs over partition TOTALS") {
    val p = plan("p14_shard_budget")
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window")) == 1, p)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("p16: uniform draw is TakeOrdered heaps, never a global sort") {
    val p = plan("p16_uniform_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("t14: gopher stats are one scan-stage projection, no shuffle agg") {
    val p = plan("t14_gopher_rules")
    // only the final orderBy exchanges; the stats never group or join
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("HashAggregate") && !p.contains("Join"), p)
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("text") && !read.contains("source"))
  }

  test("t15/e13: card and cadence rollups are one partial-agg shuffle") {
    for (q <- Seq("t15_corpus_card", "e13_bot_flags")) {
      val p = plan(q)
      // map-side partial aggregation, exactly one hash exchange (the
      // groupBy; the sort is range, the read preamble round-robin),
      // no join, no window
      assert(p.contains("partial_"), q)
      assert("hashpartitioning\\(".r.findAllIn(p).size == 1, s"$q:\n$p")
      assert(!p.contains("Join") && !p.contains(") Window"), q)
    }
  }

  test("d18: per-cluster argmax is a two-level agg, never a window") {
    val p = plan("d18_cluster_keep_best")
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window")) == 0, p)
    assert(!p.contains("CartesianProduct"))
    // max(struct) lowers to SortAggregate — fine: what matters for a
    // mega-cluster is the PARTIAL level below the exchange, so each
    // cluster crosses the wire as one fixed-width row per map partition
    assert(p.contains("partial_max"), p)
  }

  test("e15: gap profile is one user window + a partial-agg rollup") {
    val p = plan("e15_event_gaps")
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window")) == 1, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), p) // map-side partials into the rollup
  }

  test("t16/p18: LM scoring joins on token, no cartesian, pruned scans") {
    for (q <- Seq("t16_surprisal", "p18_dsir_weights")) {
      val p = plan(q)
      // the only nested-loop is the broadcast of the 1-row total(s);
      // token scoring and count rollups must stay equi-joins/aggregates
      assert(!p.contains("CartesianProduct"), q)
      assert(p.contains("partial_count"), q) // map-side count partials
      // documents scan reads only what the op needs (no source/n_chars)
      val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
      assert(reads.nonEmpty && reads.forall(r =>
        !r.contains("source") && !r.contains("n_chars")), q)
    }
  }

  test("t19: the C4 rewrite is a scan-stage projection — no shuffle " +
    "but the final sort, no join, no aggregate") {
    val p = plan("t19_c4_rules")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("HashAggregate") && !p.contains("Join"), p)
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("text") && !read.contains("source") &&
      !read.contains("lang"))
  }

  test("t20: bigram scoring is equi-joins on pair/context keys, " +
    "no cartesian, pruned scans") {
    val p = plan("t20_bigram_surprisal")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(r =>
      !r.contains("source") && !r.contains("n_chars")), p)
  }

  test("t21/d23: script profile and doc-line dedup are scan-stage " +
    "projections — no shuffle but the final sort, no join, no agg") {
    for (q <- Seq("t21_script_profile", "d23_scrub_doc_lines")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"), q)
      assert(!p.contains("HashAggregate") && !p.contains("Join"), q)
    }
  }

  test("d22: containment candidates come from the gram equi-join — " +
    "no cartesian, map-side partial counts") {
    val p = plan("d22_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q34: full outer pre-aggregates the orders side below the join") {
    val p = plan("q34_full_outer")
    assert(p.contains("FullOuter"), p)
    // partial aggregation of orders happens BEFORE the outer join:
    // narrow (custkey, spend) rows cross the join exchange, never raw
    // orders rows
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q35: grouping sets expand once into ONE partial aggregation") {
    val p = plan("q35_grouping_sets")
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Expand")) == 1, p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Join"), p)
  }

  test("q38: all three distribution ranks share ONE Window operator") {
    val p = plan("q38_ntile_dist")
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window")) == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("p22: repeat-cap mix has no cartesian; the prefix fold is " +
    "partition-local and the only window is the totals prefix") {
    val p = plan("p22_repeat_cap_mix")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("MapPartitions"), p) // prefixSumBy local fold
    // the only Window is prefixSumBy's numPartitions-row totals prefix
    // (the p07/p14 shape) — it prints once per consuming branch (main +
    // source-start offsets; both share the localCheckpoint at runtime)
    // but is never a per-source window over the corpus
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window")) <= 2, p)
    // per-source stats and start offsets join broadcast (bounded rows)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t22: chunking is scan-stage only — a generate, no data shuffle") {
    val p = plan("t22_text_chunks")
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Generate")) == 1, p)
    assert(!p.contains("Join"), p)
    // the single Exchange serves the final deterministic orderBy
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Exchange")) <= 1, p)
  }

  test("s10: SQ8 corpus rows carry byte codes, not double arrays, " +
    "into the scoring join") {
    val p = plan("s10_knn_sq8")
    // the scoring side projects the encoded binary codes; the ADC term
    // appears as the fused expression over (sp, codes)
    assert(p.contains("graft_sq8_encode"), p)
    assert(p.contains("graft_sq8_dot"), p)
    // the only nested loop is the declared broadcast of the probe rows
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e17: both branch exchanges hash on user_id alone; rollup, join, " +
    "and forward-fill window all ride them with no further shuffle") {
    val p = graft.ops.Events.gapFillDaily(
        Tables.load(spark, dir, "events"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // two pruned branches (daily rollup / span grid), one narrow
    // user_id exchange each — and nothing downstream re-exchanges:
    // the (user_id, day) rollup and the window both ride user_id
    // partitioning (subset satisfies ClusteredDistribution)
    val hashArgs = p.linesIterator.count(l =>
      l.contains("hashpartitioning(user_id"))
    assert(hashArgs == 2, s"expected 2 user_id exchanges, got $hashArgs:\n$p")
    assert(!p.contains("rangepartitioning"), s"no sort exchange expected:\n$p")
  }

  test("q39: recursion executes as UnionLoop (iterative closure), the " +
    "rollup keeps partial aggregation") {
    val p = plan("q39_recursive_cte")
    assert(p.contains("UnionLoop"), s"expected UnionLoop in:\n$p")
    assert(p.contains("HashAggregate"))
  }

  test("q41: LATERAL decorrelates to one ranked join with the group-" +
    "limit pushed below the shuffle, no per-row re-scan") {
    val p = SparkEntry.queries("q41_lateral_topn")(spark, dir)
      .queryExecution.executedPlan.toString
    // set-based rewrite: row_number <= 2 with WindowGroupLimit (each
    // task keeps 2 rows per key BEFORE the exchange), one join, and
    // exactly one scan per relation — never an orders re-scan per row
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Join"), p)
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 2, s"expected 2 scans, got $scans:\n$p")
  }

  test("harness boundary: no query ships array/map/struct columns (the " +
    "r8 t30/t31 crash class — pandas cannot sort such cells; use " +
    "Relational.harnessDigest + a size column instead)") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, run) =>
        val bad = run(spark, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => f.name
        }
        if (bad.isEmpty) None else Some(s"$name(${bad.mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"queries emitting non-scalar columns at the harness boundary: " +
        s"${offenders.mkString("; ")}")
  }

  test("d28: triangle counting is equi-joins end to end — no cartesian; " +
    "the wedge ordering filter rides the src-keyed join, never a " +
    "nested loop") {
    val p = plan("d28_triangle_count")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("e23: Welch arms reduce map-side — one fixed-width rollup, " +
    "no cartesian, no window over the unit frame") {
    val p = plan("e23_welch_t")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("q43: MERGE applies as ONE full-outer equi join on the key — " +
    "no cartesian, no nested loop") {
    val p = plan("q43_merge_upsert")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FullOuter"), p)
  }

  test("d31: the banded DP runs above the repartition+checkpoint " +
    "parallelism barrier (r12) — levenshtein filters a Scan ExistingRDD, " +
    "never a coalesced join stage; no cartesian/nested loop") {
    val p = plan("d31_edit_distance")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate machinery (equi-joins on gram hashes + the abs()
    // length-gap prune) sits BELOW the checkpoint and materializes in
    // its own job — the final plan must show the DP evaluating directly
    // over the checkpointed pair snapshot, which is the whole point of
    // the barrier (predicate pushdown would otherwise drag it into the
    // AQE-coalesced single-partition join stage)
    assert(p.contains("ExistingRDD"), p)
    val li = p.indexOf("levenshtein")
    assert(li >= 0, p)
    assert(p.contains("(mx"), "threshold k derives from mx per row: " + p)
  }

  test("t42: entropy is scan-stage — besides loadParallel's round-robin " +
    "spread, the only exchange is the final sort; no aggregation") {
    val p = plan("t42_char_entropy")
    val ex = p.linesIterator.count(l =>
      l.startsWith("(") && l.contains(") Exchange"))
    assert(ex == 2 && p.contains("RoundRobinPartitioning"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("e25: one corpus-sized rollup, then ONE window over the dense " +
    "spine — no cartesian") {
    val p = plan("e25_ewma_anomaly")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(l =>
      l.startsWith("(") && l.contains(") Window")) == 1, p)
  }

  test("q44: percentiles run ONE sort window per group key then a " +
    "map-side rollup — no self-join of the ranked frame") {
    val p = plan("q44_percentile")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Join"), p)
  }

  test("e26: DiD reduces to a <=2-row arm rollup before the 1x1 join — " +
    "the unit frame is never windowed or cross-joined") {
    val p = plan("e26_did")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("d34: prefix-filtered join is equi-only (no cartesian) and every " +
    "exchange before the verify stage carries fixed-width rows, never " +
    "gram text") {
    val p = plan("d34_prefix_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    // candidate generation joins on the 64-bit gram hash; the prefix
    // rank window partitions on doc id — no exchange ships gram strings
    val lines = p.linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty)
    exchangeInputs.foreach { in =>
      assert(!in.contains("g#"), s"exchange shuffles gram text: $in")
    }
  }

  test("d35: assortativity is equi-joins + ONE global agg — no " +
    "cartesian, no window") {
    val p = plan("d35_assortativity")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("t45: dup-gram fraction shuffles only hashed gram longs (the " +
    "d12/d20 index shape) — no cartesian, no gram text in exchanges") {
    val p = plan("t45_dup_fraction")
    assert(!p.contains("CartesianProduct"), p)
    val lines = p.linesIterator.toSeq
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches("""\(\d+\) Exchange.*""") }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty)
    exchangeInputs.foreach { in =>
      assert(!in.contains("g#"), s"exchange shuffles gram text: $in")
    }
  }

  test("q45: the bucket decomposition turns the BETWEEN join into an " +
    "EQUI join — no nested-loop, no cartesian, an explode feeds it") {
    val p = plan("q45_range_bucket_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate"), p) // the interval→buckets explode
  }

  test("p27: stratified draw runs ONE corpus window keyed by stratum + " +
    "map-side-combined counts; the apportionment frame never cross-joins") {
    val p = plan("p27_stratified_k")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("t47: textrank rounds are (doc, word)-keyed equi joins — no " +
    "cartesian anywhere in the materialized round chain") {
    val p = plan("t47_textrank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("e29: seasonal moments reduce via hash-agg and broadcast back — " +
    "no window over the spine, no cartesian") {
    val p = plan("e29_seasonal_anomaly")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p) // slot stats attach
  }

  test("t48: source prior is ONE rollup + a 1-row broadcast — no " +
    "window, no cartesian; the corpus is touched once") {
    val p = plan("t48_source_prior")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("s20: ILD pair work rides bounded top-k lists — the only " +
    "non-equi join is the declared s01 probe broadcast") {
    val p = plan("s20_ild_diversity")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p) // the s01 top-k rank
    assert(p.contains("HashAggregate"), p)
  }

  test("t59: blocklist gate is pure scan-stage arithmetic — no " +
    "hash exchange, no join, no aggregation; only the deterministic " +
    "final sort moves rows") {
    val p = plan("t59_blocklist_gate")
    // formatted mode prints partitioning on the Exchange node's
    // Arguments line, so match the partitioning function itself
    assert(!p.contains("hashpartitioning("), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("t60: chi2 outliers never build a doc x topK grid — broadcast " +
    "joins only for the K-row/1-row sides, no cartesian, no window") {
    // checkpoint=false: the query's default eagerly localCheckpoints for
    // cache hygiene (r12 advice), which truncates explain to a Scan
    // ExistingRDD — pin the DECLARATIVE plan the op actually builds
    val df = graft.ops.Corpus.chi2Outliers(
      graft.Tables.load(spark, dir, "documents"), "doc_id", "text",
      topK = 16, checkpoint = false)
    val p = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("p31: the sentence-pack fold is scan-stage; exactly ONE hash " +
    "exchange (the (doc, chunk) rollup) moves fixed-width rows") {
    val p = plan("p31_sentence_chunks")
    val hashEx = p.linesIterator.count(_.contains("hashpartitioning("))
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx\n$p")
    assert(!p.contains("Join"), p)
  }

  test("d41: substring-dup candidates come from an EQUI join on the " +
    "shingle hash pair — no cartesian, no nested loop; islands are one " +
    "(pair, diagonal) window") {
    val p = plan("d41_substring_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("e40: Theil-Sen pair work is an equi join on event_type over the " +
    "HOURLY rollup (series-bounded, not event rows) — no cartesian, no " +
    "nested loop; median via the per-type rank window") {
    val p = plan("e40_theil_sen")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p) // the hourly rollup reduces first
  }

  test("t68: token Gini is one per-source sort window + one hash rollup " +
    "— no join of any kind") {
    val p = plan("t68_token_gini")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("s24: migration audit is two fused argmins in one scan pass — " +
    "no join of any kind, one list-keyed rollup") {
    val p = plan("s24_centroid_migration")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("graft_nearest_centroid"), p)
  }
}



