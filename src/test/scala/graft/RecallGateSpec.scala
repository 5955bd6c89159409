package graft

/** Quantitative recall gates for the LSH-family queries.
  *
  * The fixture-level specs (DedupSpec, SimilaritySpec) prove containment on
  * 5-8 rows; they would NOT catch a banding or hyperplane regression that
  * silently halves recall on real data. These gates run on the driver's
  * sf0.01 tables against the hash-verified exact queries:
  *   - dd_minhash_lsh   (exact-verified since round 9) — SET EQUALITY with
  *     dd_ngram_jaccard, plus a ≥0.9 recall floor on the est-only
  *     candidate stage
  *   - dd_simhash       vs dd_ngram_jaccard's high-similarity (≥ 0.9)
  *     pairs (Hamming ≤ 6 on the 64-bit MD5 SimHash is a DIFFERENT
  *     near-dup notion than jaccard — dd_simhash's own oracle is the
  *     brute-force Hamming join; this gate checks the two notions still
  *     overlap on real near-dups)
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

  test("verified minhash LSH equals the exact jaccard≥0.5 pair set at sf0.01") {
    // dd_minhash_lsh is exact-verified since round 9: candidate recall 1.0
    // AND verification precision 1.0 ⟺ set equality with the inverted-index
    // exact query. Equality (not one-sided recall) so a precision bug in
    // the verify join fails too.
    val truth = idPairs("dd_ngram_jaccard")
    val lsh = idPairs("dd_minhash_lsh")
    assert(truth.nonEmpty)
    assert(lsh == truth,
      s"missed: ${truth.diff(lsh)}; spurious: ${lsh.diff(truth)}")
  }

  test("est-only minhash LSH (candidate stage) recalls ≥90% of true pairs at sf0.01") {
    // The un-verified estimator variant stays recall-gated: its est_raw
    // filter can drop borderline-true pairs (k=32 quantizes to 1/32).
    val truth = idPairs("dd_ngram_jaccard")
    val lsh = graft.functions.Dedup.minhashLshPairs(
        Tables.documents(spark, sfDir),
        "doc_id", "text", shingleN = 5, k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & lsh).size.toDouble / truth.size
    info(f"minhash LSH (est-only) recall = $recall%.3f (${(truth & lsh).size}/${truth.size})")
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
