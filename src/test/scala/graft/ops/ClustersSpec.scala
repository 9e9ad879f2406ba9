package graft.ops

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("two disjoint clusters resolve to their min ids") {
    val got = cc((1L, 2L), (2L, 3L), (10L, 11L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long chain converges to one cluster (pointer jumping)") {
    // worst case for pure propagation: a path graph; jumping keeps the
    // round count logarithmic, and correctness must be unaffected
    val chain = (1L until 64L).map(i => (i, i + 1))
    val got = cc(chain: _*)
    assert(got.keySet == (1L to 64L).toSet && got.values.forall(_ == 1L))
  }

  test("edge direction and duplication don't matter") {
    assert(cc((5L, 2L), (2L, 5L), (5L, 2L), (2L, 9L)) ==
      Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("dedupClusters marks exactly one canonical doc per cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val got = Clusters.dedupClusters(pairs, "id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (7L, 7L, 1), (8L, 7L, 0)))
  }
}
