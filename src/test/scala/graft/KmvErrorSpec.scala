package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.functions._

/** Error-bound and invariance gates for the two HASH-CHECKED sketch
  * queries added in round 10 (a18b KMV distinct, a19b histogram
  * quantiles). Their DuckDB oracles prove the two engines compute the
  * SAME estimate; these tests prove the estimate is WORTH computing —
  * close to the exact answer on the driver's sf0.01 data — and that the
  * KMV buffer really is partition/merge-order invariant (the property
  * that makes the oracle deterministic at all).
  */
class KmvErrorSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = sys.env.getOrElse("GRAFT_RECALL_SF_DIR", "/root/testdata/sf0.01")

  test("a18b KMV estimates are within 4·rsd of exact distinct counts") {
    // k=64 → rsd ≈ 1/√63 ≈ 12.6%; 4·rsd = 50.4%. Realized errors at
    // sf0.01 measure ~3% (users, nd=150) and ~10-15% (event_ids,
    // nd≈2000/group) — the bound has wide headroom, a broken estimator
    // (off by 2× or degenerate) still fails.
    val est = SparkEntry.queries("a18b_kmv_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("u"), count_distinct(col("event_id")).as("e"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    est.foreach { case (k, (eu, ee)) =>
      val (tu, te) = exact(k)
      assert(math.abs(eu - tu) / tu <= 0.504, s"$k users: est $eu vs true $tu")
      assert(math.abs(ee - te) / te <= 0.504, s"$k events: est $ee vs true $te")
    }
  }

  test("a19b histogram quantiles honor the (mx-mn)/B error bound vs exact") {
    val approx = SparkEntry.queries("a19b_histogram_quantiles")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // The DATA-INDEPENDENT guarantee: the estimate and the rank-ceil(p·n)
    // ORDER STATISTIC it targets lie in the same equi-width bucket, so
    // |est − orderstat| ≤ (mx−mn)/256 for ANY value distribution. (Not
    // asserted against interpolating `percentile()`: a regenerated corpus
    // with a sparse tail — adjacent order statistics further apart than a
    // bucket — would fail that comparison with both engines still in
    // perfect agreement.)
    val e = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val grouped = e.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(approx.nonEmpty && approx.keySet.map(_._1) == grouped.keySet)
    approx.foreach { case ((key, p), est) =>
      val vs = grouped(key)
      val bound = (vs.last - vs.head) / 256.0
      val orderStat = vs(math.ceil(p * vs.length).toInt - 1) // 1-based rank
      assert(math.abs(est - orderStat) <= bound + 1e-9,
        s"($key, $p): est $est vs order statistic $orderStat (bound $bound)")
    }
  }

  test("KmvMinHashes is partition/merge-order invariant and dedupes") {
    val vals = (1L to 5000L).map(i => i % 700) // heavy duplication
    def sketch(parts: Int): Seq[Long] =
      vals.toDF("v").repartition(parts)
        .agg(TopKAgg.kmvMinHashes(col("v"), 64).as("s"))
        .collect().head.getSeq[Long](0)
    val one = sketch(1)
    assert(one == sketch(7) && one == sketch(32))
    assert(one.length == 64 && one == one.sorted && one.distinct.length == 64)
    // ≤ k distinct values → the sketch IS the distinct set
    val small = Seq(5L, 5L, 3L, 9L, 3L).toDF("v")
      .agg(TopKAgg.kmvMinHashes(col("v"), 64).as("s"))
      .collect().head.getSeq[Long](0)
    assert(small == Seq(3L, 5L, 9L))
  }
}
