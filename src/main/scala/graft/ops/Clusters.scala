package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: the step between pair FINDING (Dedup's
  * inverted-index / LSH joins emit near-dup PAIRS) and actual corpus
  * dedup, which needs one canonical document per transitive cluster —
  * A~B and B~C must purge to a single representative even when A and C
  * were never compared. (The reference engine has no graph step at all;
  * this is the training-data-pipeline completion of its DISTINCT,
  * src/qp/operators/Distinct.java, done at corpus scale.)
  *
  * Algorithm: iterative minimum-label propagation with pointer jumping
  * (the "hash-to-min" family — Rastogi et al., "Finding Connected
  * Components in Map-Reduce in Logarithmic Rounds", ICDE 2013). Each
  * round:
  *
  *   1. propagate: comp(u) <- min(comp(u), min over neighbors v of comp(v))
  *   2. jump:      comp(u) <- min(comp(u), comp(comp(u)))
  *
  * Both steps are equi-joins + min-aggregations over fixed-width
  * (long, long) rows — map-side partial aggregation applies, nothing wide
  * ever shuffles. Pointer jumping halves label-chain depth each round, so
  * convergence is O(log diameter) rounds, not O(diameter) — near-dup
  * graphs are mostly dense clique-ish clusters (1–2 rounds), but a
  * pathological chain of pairwise-similar docs cannot stall the job.
  * Every round ends in an eager localCheckpoint: iterative DataFrame
  * loops otherwise accumulate lineage and re-plan the full history each
  * action (Janino blowup + re-execution risk at scale).
  *
  * At 100 TB the edge list (near-dup pairs) is orders of magnitude
  * smaller than the corpus, and per-round cost is proportional to
  * |edges|, not |corpus|; the driver sees only one count per round
  * (convergence check), never data.
  */
object Clusters {

  /** Connected components of the undirected graph given as an edge list.
    * Returns (id, cluster_id): every node that appears in `edges`, labeled
    * with the MINIMUM id reachable from it — a deterministic, portable
    * cluster id. Nodes not mentioned in any edge are absent (a singleton
    * is its own trivial cluster; callers left-anti-join if they need the
    * full corpus labeled).
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    // undirected: keep both directions; distinct so parallel edges don't
    // multiply join rows. Checkpointed once — reused every round.
    val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()

    // comp(u) starts at min(u, min neighbor)
    var labels = bidir.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("comp"))
      .localCheckpoint()

    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      require(rounds <= 64, "connectedComponents failed to converge") // 2^64 ids
      // 1. propagate neighbor labels
      val nbrMin = bidir
        .join(labels.select(col("u").as("v"), col("comp").as("nc")), "v")
        .groupBy("u").agg(min("nc").as("cand"))
      val prop = labels.join(nbrMin, Seq("u"), "left")
        .select(col("u"),
          least(col("comp"), coalesce(col("cand"), col("comp"))).as("comp"))
      // 2. pointer jump: follow the label one hop (comp values are node
      // ids, so they are keys of `prop` itself)
      val next = prop.as("x")
        .join(prop.select(col("u").as("t"), col("comp").as("tc")).as("y"),
          col("x.comp") === col("y.t"))
        .select(col("x.u").as("u"), least(col("x.comp"), col("y.tc")).as("comp"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.select(col("u"), col("comp").as("old")), "u")
        .filter(col("comp") =!= col("old")).count()
      labels = next
    }
    labels.select(col("u").as("id"), col("comp").as("cluster_id"))
  }

  /** Near-dup cluster assignment from a pair list (id_a, id_b):
    * (doc_id, cluster_id, keep) where cluster_id is the cluster's minimum
    * doc id and keep marks the canonical representative — the purge list
    * is `keep = 0`. Output covers only docs that occur in a pair;
    * untouched docs are implicitly kept.
    */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("doc_id"), col("cluster_id"),
        when(col("id") === col("cluster_id"), 1).otherwise(0).as("keep"))
}
