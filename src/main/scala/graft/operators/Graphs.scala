package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives needed by the dedup pipeline (cluster the
  * near-duplicate pair graph, keep one canonical doc per cluster).
  *
  * Spark has no built-in connected components on DataFrames; this is the
  * classic min-label propagation: every node starts labeled with itself,
  * and each round takes the min label over itself and its neighbors until
  * no label changes. Rounds needed = graph diameter; near-dup graphs are
  * overwhelmingly small star-shaped clusters (diameter ≤ ~3), so the loop
  * terminates in a handful of rounds.
  *
  * Scale notes for 100 TB:
  *   - per round: one shuffle to join labels onto edge endpoints + one
  *     shuffle for the min-aggregate — both on 8-byte node ids; document
  *     payloads never enter the graph.
  *   - labels are cached per round and unpersisted as soon as the next
  *     round is computed; `localCheckpoint` truncates the growing lineage
  *     so round N's plan does not replay rounds 1..N-1.
  *   - convergence is detected with a `limit(1).isEmpty` anti-check, not a
  *     count of all rows — the job short-circuits on the first changed row.
  *   - for adversarial long-path graphs, swap the propagation body for the
  *     large-star/small-star rewrite (Kiveris et al., "Connected Components
  *     in MapReduce and Beyond") — same driver-loop skeleton, O(log n)
  *     rounds; plain propagation is the right default for dedup shapes.
  */
object Graphs {

  /** Connected components of an undirected edge list. Returns one row per
    * distinct node: (node, component) where component = min node id
    * reachable from it. Nodes appear only if they touch an edge — callers
    * left-join and coalesce to self for singletons.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .cache()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint() // materialize: each round builds on data, not lineage
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // Neighbor messages: every edge forwards its dst's current label to src.
      val msgs = sym.join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("component"))
      val next = labels.union(msgs)
        .groupBy("node").agg(min("component").as("component"))
        .localCheckpoint()
      converged = next.as("n").join(labels.as("l"), "node")
        .filter(col("n.component") < col("l.component"))
        .limit(1).isEmpty
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Cluster near-duplicate pairs and assign every doc a canonical id
    * (min doc id of its component; docs in no pair are their own
    * canonical) plus the cluster size. The "keep one per near-dup
    * cluster" primitive of a training-data dedup pass.
    */
  def canonicalClusters(docs: DataFrame, idCol: String,
                        pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val labeled = docs.select(col(idCol))
      .join(cc.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("canonical_id"))
    val sizes = labeled.groupBy("canonical_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "canonical_id")
      .select(col(idCol), col("canonical_id"), col("cluster_size"))
  }
}
