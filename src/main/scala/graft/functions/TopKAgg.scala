package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact top-k values per group as a custom `Aggregator` — the §2.9
  * extension point (the reference's workload needs no custom aggregate;
  * this is the training-data-pipeline path: "k best examples per key"
  * without a window sort).
  *
  * Scale rationale vs. the window formulation (`row_number() <= k`):
  * the aggregator's partial buffers are size-k arrays merged map-side, so
  * the shuffle carries k doubles per (partition, key) instead of every row
  * of every key — for a hot key with 10^9 rows that is the difference
  * between a skewed sort and a constant-size merge. Deterministic: the
  * result is the multiset of the k largest values, independent of
  * partitioning/merge order.
  */
class TopKDoubles(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {

  /** Buffer: ascending-sorted array of ≤ k retained values (min first for
    * O(1) smallest-check on insert).
    */
  override def zero: Array[Double] = Array.empty[Double]

  private def insert(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length < k) {
      val out = new Array[Double](buf.length + 1)
      var i = 0
      while (i < buf.length && buf(i) < v) { out(i) = buf(i); i += 1 }
      out(i) = v
      while (i < buf.length) { out(i + 1) = buf(i); i += 1 }
      out
    } else if (v <= buf(0)) buf
    else {
      val out = new Array[Double](k)
      var i = 1 // drop current min (buf(0))
      var j = 0
      while (i < k && buf(i) < v) { out(j) = buf(i); i += 1; j += 1 }
      out(j) = v; j += 1
      while (i < k) { out(j) = buf(i); i += 1; j += 1 }
      out
    }
  }

  override def reduce(buf: Array[Double], v: Double): Array[Double] = insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var acc = a
    var i = 0
    while (i < b.length) { acc = insert(acc, b(i)); i += 1 }
    acc
  }

  /** Output: descending (largest first). */
  override def finish(buf: Array[Double]): Array[Double] = buf.reverse

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object TopKAgg {
  /** Column form: `topKValues(col("value"), 3)` inside `agg(...)`. */
  def topKValues(c: Column, k: Int): Column = udaf(new TopKDoubles(k)).apply(c)
}
