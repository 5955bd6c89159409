package graft

/** Quantitative recall gates for the three no-oracle LSH queries.
  *
  * The fixture-level specs (DedupSpec, SimilaritySpec) prove containment on
  * 5-8 rows; they would NOT catch a banding or hyperplane regression that
  * silently halves recall on real data. These gates run the exact registry
  * queries on the driver's sf0.01 tables and measure recall against the
  * hash-verified exact queries:
  *   - dd_minhash_lsh   vs dd_ngram_jaccard (true jaccard ≥ 0.5 pairs)
  *   - dd_simhash       vs dd_ngram_jaccard's high-similarity (≥ 0.9) pairs
  *     (Hamming ≤ 3 on 64-bit SimHash is a tighter near-dup notion than
  *     jaccard 0.5 — moderately-similar pairs legitimately fall outside it)
  *   - sim_ann_lsh      vs sim_knn_brute (recall@5 over the same 10 queries)
  * Floors are set with headroom below measured recall (documented per test)
  * so data-noise can't flake the suite, while a halving regression fails.
  */
class RecallGateSpec extends SparkSpec {
  // Override for a cross-SF audit: GRAFT_RECALL_SF_DIR=/root/testdata/sf0.1
  private val sfDir = sys.env.getOrElse("GRAFT_RECALL_SF_DIR", "/root/testdata/sf0.01")

  private def idPairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH recalls ≥90% of true jaccard≥0.5 near-dup pairs at sf0.01") {
    val truth = idPairs("dd_ngram_jaccard")
    val lsh = idPairs("dd_minhash_lsh")
    val recall = (truth & lsh).size.toDouble / truth.size
    info(f"minhash LSH recall = $recall%.3f (${(truth & lsh).size}/${truth.size})")
    assert(truth.nonEmpty)
    assert(recall >= 0.9)
  }

  test("simhash recalls ≥90% of true jaccard≥0.9 near-dup pairs at sf0.01") {
    val truth = SparkEntry.queries("dd_ngram_jaccard")(spark, sfDir).collect()
      .filter(_.getDouble(2) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = idPairs("dd_simhash")
    val recall = (truth & sim).size.toDouble / truth.size
    info(f"simhash recall = $recall%.3f (${(truth & sim).size}/${truth.size})")
    assert(truth.nonEmpty)
    assert(recall >= 0.9)
  }

  test("LSH ANN recall@5 ≥0.8 vs brute-force top-5 at sf0.01") {
    val truth = idPairs("sim_knn_brute")
    val ann = idPairs("sim_ann_lsh")
    val recall = (truth & ann).size.toDouble / truth.size
    info(f"ANN recall@5 = $recall%.3f (${(truth & ann).size}/${truth.size})")
    assert(truth.size == 50) // 10 queries × k=5
    assert(recall >= 0.8)
  }
}
