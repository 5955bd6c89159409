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
}
