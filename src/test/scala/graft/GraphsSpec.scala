package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation: multi-hop chains collapse
  * to one component, separate clusters stay separate, singletons become
  * their own canonical.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("chain, triangle, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3, needs >1 round), triangle 10-11-12 with
    // redundant edges, pair 20-21
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a", "b")
    val cc = Graphs.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("canonicalClusters: docs outside any pair are their own canonical") {
    val docs = Seq(1L, 2L, 3L, 4L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Graphs.canonicalClusters(docs, "doc_id", pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), // one 3-doc cluster
      (4L, 4L, 1L), (99L, 99L, 1L)))            // singletons
  }

  test("non-convergence throws instead of returning partial labels") {
    // 64-node path has diameter 63; plain propagation can't finish in 5.
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Graphs.connectedComponents(path, "a", "b", maxIter = 5).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("large-star/small-star variant collapses a 64-node path in O(log n) rounds") {
    // parent(u) retreats by 2^(round-1) per round under path halving, so
    // 64 nodes need ~log2(64)+2 rounds — 15 is ample, 63 would be needed
    // by plain propagation.
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Graphs.connectedComponentsLogN(path, "a", "b", maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 64)
    assert(cc.values.forall(_ == 0L))
  }

  test("logN variant matches plain propagation on the mixed fixture") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a", "b")
    val plain = Graphs.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val logn = Graphs.connectedComponentsLogN(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == logn)
  }
}
