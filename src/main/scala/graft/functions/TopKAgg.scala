package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{conv, element_at, lit, md5, size, substring, udaf, when}

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

  // NaN is excluded outright: every comparison with NaN is false, so one
  // NaN in the buffer corrupts the ascending invariant and makes the
  // retained set depend on arrival/merge order — the exact property this
  // Aggregator promises not to have. Top-k of a set with NaNs is
  // ill-defined anyway; callers that care should null-guard upstream.
  override def reduce(buf: Array[Double], v: Double): Array[Double] =
    if (v.isNaN) buf else insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var acc = a
    var i = 0
    while (i < b.length) { acc = reduce(acc, b(i)); i += 1 }
    acc
  }

  /** Output: descending (largest first). */
  override def finish(buf: Array[Double]): Array[Double] = buf.reverse

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** The k lexicographically-smallest `(priority, id)` pairs per group —
  * the bounded-buffer engine behind "cap every source at N documents":
  * priority is a deterministic hash, so the retained set is a reproducible
  * uniform sample of each group, selected WITHOUT sorting the group.
  *
  * Same scale rationale as [[TopKDoubles]]: the window formulation
  * (`row_number() OVER (PARTITION BY source ORDER BY priority) <= k`)
  * shuffles and sorts EVERY row of every source; this aggregator's partial
  * buffers carry at most k pairs per (partition, source) map-side, so a
  * source with 10^9 documents costs the shuffle k × 16 bytes, not 10^9
  * sorted rows. Deterministic: the result is the set of k smallest pairs,
  * independent of partitioning/merge order (ids are unique, so pairs are).
  */
class BottomKPairs(k: Int) extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {

  /** Buffer: ascending lexicographic, ≤ k pairs (max last for O(1) check). */
  override def zero: Array[(Long, Long)] = Array.empty

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] = {
    if (buf.length < k) {
      val out = new Array[(Long, Long)](buf.length + 1)
      var i = 0
      while (i < buf.length && lt(buf(i), v)) { out(i) = buf(i); i += 1 }
      out(i) = v
      while (i < buf.length) { out(i + 1) = buf(i); i += 1 }
      out
    } else if (!lt(v, buf(k - 1))) buf
    else {
      val out = new Array[(Long, Long)](k)
      var i = 0 // current max (buf(k-1)) is dropped
      var j = 0
      while (i < k - 1 && lt(buf(i), v)) { out(j) = buf(i); i += 1; j += 1 }
      out(j) = v; j += 1
      while (j < k) { out(j) = buf(i); i += 1; j += 1 }
      out
    }
  }

  override def reduce(buf: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] = insert(buf, v)

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    var acc = a
    var i = 0
    while (i < b.length) { acc = insert(acc, b(i)); i += 1 }
    acc
  }

  /** Output: ascending (best-priority first) — position = selection rank. */
  override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Long, Long)]] = ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] = ExpressionEncoder[Array[(Long, Long)]]()
}

/** Misra-Gries heavy-hitter sketch (Misra & Gries '82; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS'12): ≤ k (key, count)
  * counters per buffer, so the shuffle carries k pairs per partition
  * regardless of key cardinality.
  *
  * Guarantees (what the `a21_heavy_hitters` oracle leans on): after any
  * sequence of reduces and merges over n items, every key with true
  * frequency > n/k is PRESENT in the sketch (no false negatives), and
  * each kept counter underestimates its true count by at most n/k.
  * Counter VALUES depend on partition/merge order — only the candidate
  * SET is deterministic enough to use, which is why the consumer runs an
  * exact verification pass over the ≤k candidates instead of trusting
  * the estimates.
  */
class MisraGries(k: Int) extends Aggregator[Long, Array[(Long, Long)], Array[(Long, Long)]] {

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(buf: Array[(Long, Long)], v: Long): Array[(Long, Long)] = {
    var i = 0
    while (i < buf.length) {
      if (buf(i)._1 == v) { buf(i) = (v, buf(i)._2 + 1); return buf }
      i += 1
    }
    if (buf.length < k) buf :+ ((v, 1L))
    else {
      // no slot: decrement every counter, drop the zeroed ones
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](buf.length)
      var j = 0
      while (j < buf.length) {
        if (buf(j)._2 > 1L) out += ((buf(j)._1, buf(j)._2 - 1L))
        j += 1
      }
      out.toArray
    }
  }

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    val m = scala.collection.mutable.LongMap.empty[Long]
    a.foreach { case (key, c) => m(key) = m.getOrElse(key, 0L) + c }
    b.foreach { case (key, c) => m(key) = m.getOrElse(key, 0L) + c }
    if (m.size <= k) m.iterator.map { case (key, c) => (key, c) }.toArray
    else {
      // subtract the (k+1)-th largest count from all, keep the positive —
      // the mergeable-summaries rule that preserves the n/k error bound
      val counts = m.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k)
      m.iterator.collect { case (key, c) if c > cut => (key, c - cut) }.toArray
    }
  }

  /** Descending by estimate, key asc on ties — stable to read, but
    * remember the estimates are order-dependent; consume the KEYS.
    */
  override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] =
    buf.sortBy { case (key, c) => (-c, key) }

  override def bufferEncoder: Encoder[Array[(Long, Long)]] = ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] = ExpressionEncoder[Array[(Long, Long)]]()
}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM'02; mergeable per Agarwal et al., PODS'12): the buffer is the
  * ≤ k smallest DISTINCT hash values seen, ascending — constant-size,
  * merge = set-union-then-trim, independent of partitioning/merge order
  * (a deterministic FUNCTION of the input value set, unlike HLL register
  * races... which are also deterministic, but engine-private).
  *
  * Why this exists next to `approx_count_distinct`: the HLL sketch's
  * registers are Spark-internal, so a18's estimates can never be
  * hash-compared cross-engine. KMV over a STANDARD hash (the carrier
  * query feeds it md5-derived 60-bit integers) is replayable in ANSI SQL
  * — `list_slice(list_sort(list(DISTINCT h)), 1, k)` is the same sketch —
  * which turns "approximate distinct" from rows-only-checked into
  * hash-oracle-checked: estimator REGRESSIONS break the gate loudly, and
  * the error bound (rsd ≈ 1/√(k−1)) is still spec-asserted separately.
  * Scale: the shuffle carries ≤ k longs per (partition, key); estimate =
  * (k−1)/u₍ₖ₎ happens on k-row output, never on data.
  */
private[functions] object KmvOps {
  /** Insert into an ascending sorted distinct buffer of ≤ k entries. */
  def insert(buf: Array[Long], v: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // present — KMV keeps DISTINCT minima
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins >= k) buf
      else {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1) // drops buf(k-1)
        out
      }
    }
  }

  def merge(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    var acc = a
    var i = 0
    while (i < b.length) { acc = insert(acc, b(i), k); i += 1 }
    acc
  }
}

class KmvMinHashes(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  /** Buffer: ascending sorted distinct hash values, ≤ k entries. */
  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Long): Array[Long] = KmvOps.insert(buf, v, k)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvOps.merge(a, b, k)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** [[KmvMinHashes]] with a NULLABLE (boxed) input that null inputs simply
  * skip — for aggregations that must carry the sketch NEXT TO ordinary
  * counters in one pass (`pipe_incremental_report`): the primitive-input
  * variant requires a pre-filter, which forces a second aggregation and a
  * join-back that Spark cannot join-eliminate — at scale that's a whole
  * extra corpus scan for nothing.
  */
class KmvMinHashesNullable(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.empty
  override def reduce(buf: Array[Long], v: java.lang.Long): Array[Long] =
    if (v == null) buf else KmvOps.insert(buf, v.longValue, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvOps.merge(a, b, k)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Merge whole KMV SKETCHES (each an ascending ≤ k distinct array) into
  * one — the aggregator behind report-partial maintenance: union-then-trim
  * is associative and order-free, so re-aggregating persisted per-batch
  * sketches yields bit-for-bit the sketch of the union corpus. A null
  * input array (absent sketch) is skipped.
  */
class KmvMergeSketches(k: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.empty
  override def reduce(buf: Array[Long], v: Array[Long]): Array[Long] =
    if (v == null) buf else KmvOps.merge(buf, v, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvOps.merge(a, b, k)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object TopKAgg {
  /** Column form: `topKValues(col("value"), 3)` inside `agg(...)`. */
  def topKValues(c: Column, k: Int): Column = udaf(new TopKDoubles(k)).apply(c)

  /** Column form: ascending array of the ≤ k smallest distinct values of
    * a long column — the KMV distinct sketch.
    */
  def kmvMinHashes(c: Column, k: Int): Column =
    udaf(new KmvMinHashes(k), Encoders.scalaLong).apply(c)

  /** Null-skipping KMV sketch — safe to place beside ordinary counters in
    * ONE aggregation (no pre-filter, no join-back; see
    * [[KmvMinHashesNullable]]).
    */
  def kmvMinHashesNullable(c: Column, k: Int): Column =
    udaf(new KmvMinHashesNullable(k), Encoders.LONG).apply(c)

  /** Merge per-batch KMV sketches (arrays) into the union sketch. */
  def kmvMergeSketches(c: Column, k: Int): Column =
    udaf(new KmvMergeSketches(k), ExpressionEncoder[Array[Long]]()).apply(c)

  /** KMV distinct estimate from a [[KmvMinHashes]] sketch: the exact set
    * size below k, else (k−1)·spaceSize/h₍ₖ₎. `spaceSize` is the hash
    * range as an exact power-of-two double — 2⁶⁰ for the md5-prefix
    * derivation (a18b and its oracle), 2⁶³ for `xxhash64 & Long.MaxValue`
    * (the streaming twin) — and MUST travel with the hash construction:
    * the ONE definition here keeps the two carriers (and any future
    * bias-correction tweak) from silently drifting apart.
    */
  def kmvEstimate(sketch: Column, k: Int, spaceSize: Double): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(spaceSize) /
        element_at(sketch, k).cast("double"))

  /** 60-bit uniform hash from the md5 hex prefix — the cross-engine KMV
    * hash convention (a18b, the incremental report, their streaming
    * twins): replayable in ANSI SQL on any engine, unlike xxhash64 or HLL
    * internals. Defined HERE, beside its space size, so the hash width
    * and the estimator's spaceSize cannot drift apart across carriers.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** Hash space of [[md5Hash60]] — 2⁶⁰ (15 hex nibbles) as an exact
    * power-of-two double. Oracle SQL strings repeat this literal by
    * necessity; every Scala carrier must reference it from here.
    */
  val Md5Hash60Space: Double = 1152921504606846976.0

  /** [[kmvEstimate]] specialized to sketches built from [[md5Hash60]]
    * values — the ONLY estimator a md5Hash60 sketch may use.
    */
  def kmvEstimate60(sketch: Column, k: Int): Column =
    kmvEstimate(sketch, k, Md5Hash60Space)

  /** Column form: Misra-Gries candidate heavy hitters of a long column as
    * an array of `{_1 key, _2 estimate}` structs, estimate-descending.
    */
  def misraGries(c: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.scalaLong).apply(c)

  /** Column form: k smallest (priority, id) pairs per group as an array of
    * `{_1, _2}` structs, ascending. `bottomKPairs(pri, id, 50)`.
    */
  def bottomKPairs(priority: Column, id: Column, k: Int): Column =
    udaf(new BottomKPairs(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(priority, id)
}
