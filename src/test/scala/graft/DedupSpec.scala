package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (4L, "completely different content about spark catalyst optimizer rules and physical plans"),
    (5L, "another unrelated document mentioning streaming watermarks and stateful aggregation here")
  ).toDF("doc_id", "text")

  test("exact dedup: canonical id is min id of identical texts") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 2L) && out(2L) == (1L, 2L))
    assert(out(3L) == (3L, 1L) && out(4L) == (4L, 1L))
  }

  test("exact dedup with verifyText groups by (hash, text) and matches hash-only") {
    val fast = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val safe = Dedup.exact(docs, "doc_id", "text", verifyText = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == safe) // no collisions in fixture → identical output
  }

  test("ngram jaccard: exact dup pair at 1.0, near dup above 0.5, others absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    assert(pairs.contains((2L, 3L)))
    assert(pairs.size == 3)
  }

  test("minhash LSH: candidates include exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near-dup recalled
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash est_jaccard for exact dups is 1.0") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
  }

  test("simhash pairs: exact dups at hamming 0; unrelated docs not paired") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("incremental dedup classifies exact_dup / near_dup / new against the base") {
    // base = docs 1..5; delta: 11 exact-dups doc 1, 13 near-dups doc 1
    // (one word changed), 15 is brand new
    val delta = Seq(
      (11L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (13L, "the quick brown fox jumps over the lazy dog near the river bank sometimes"),
      (15L, "entirely novel delta text with no overlap in shingles whatsoever at all here")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalStatus(docs, delta, "doc_id", "text",
      n = 2, threshold = 0.5, maxDf = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // exact dup: matched to the MIN base id with identical text (1, not 2)
    assert(out(11L) == (("exact_dup", Some(1L), None)))
    val (st13, m13, j13) = out(13L)
    assert(st13 == "near_dup" && m13.contains(1L))
    assert(j13.exists(j => j > 0.5 && j < 1.0))
    assert(out(15L) == (("new", None, None)))
  }
}
