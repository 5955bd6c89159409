package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the vocabulary-learning step of a
  * tokenizer pipeline (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units"), re-expressed for Spark.
  *
  * Scale design — the key move is WHAT the merge rounds run on:
  *   1. ONE corpus-sized pass aggregates text to the distinct
  *     word-frequency table (`word → count`). This is the only stage that
  *     touches the corpus; it is an ordinary partial-agg shuffle whose
  *     output is vocabulary-sized (natural-language vocabularies are
  *     ~10^6-10^8 distinct words at web scale — thousands of times smaller
  *     than the corpus, and it is persisted so no round re-scans text).
  *   2. Each merge round runs DISTRIBUTED on that table: pair counts are
  *     an explode + partial-agg over bounded-length token arrays
  *     (weighted by word count — pair statistics are exact corpus
  *     statistics), and only the single winning (pair, count) row comes
  *     back to the driver (same bounded-collect contract as
  *     [[Similarity.ivfCentroids]]).
  *   3. Merge application is the codegen-friendly map-only
  *     [[NativeExpressions.BpeMergeApply]] kernel with the round's pair as
  *     an expression constant — no join, nothing shuffles.
  * Per-round state is persisted and the superseded round unpersisted (the
  * [[graft.operators.Graphs]] iteration pattern), so round r never
  * re-derives rounds 1..r-1.
  *
  * Determinism: counts are exact integers; the winning pair is
  * max-by-(count, then lexicographically-smallest pair) — reproducible on
  * any partitioning, and re-derivable in ANSI SQL (see the tx_bpe_merges
  * oracle, which replays every round with windowed gaps-and-islands SQL).
  */
object Bpe {

  /** The corpus→vocabulary aggregation: ASCII-alphabetic whitespace tokens
    * and their exact corpus frequencies. (ASCII-only keeps per-character
    * semantics identical across engines; production would operate on
    * bytes.)
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word").rlike("^[A-Za-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("c"))

  final case class Merge(mergeRank: Long, leftSym: String, rightSym: String, pairCount: Long)

  /** `k` greedy merge rounds over a (word, c) frequency table. Returns the
    * learned merge list (rank, left, right, pair count at selection time).
    */
  def trainMerges(wordFreq: DataFrame, k: Int): Seq[Merge] = {
    // initial symbols: one per character. array_remove drops the trailing
    // "" that Spark's limit=-1 split-on-empty emits (words are non-empty
    // alphabetic, so no interior empties exist).
    var cur = wordFreq
      .select(col("c"), array_remove(split(col("word"), ""), "").as("toks"))
      .persist()
    var prev: DataFrame = null
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val top = cur.filter(size(col("toks")) >= 2)
        .select(col("c"), explode(NativeExpressions.adjacentPairs(col("toks"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("c").as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r.toLong, a, b, cnt)
        if (prev != null) prev.unpersist() // cur's cache is materialized; release round r-1
        prev = cur
        cur = cur.withColumn("toks", NativeExpressions.bpeMergeApply(col("toks"), a, b))
          .persist()
      }
      r += 1
    }
    if (prev != null) prev.unpersist()
    cur.unpersist()
    merges.result()
  }

  /** Encode a word column into its BPE tokenization under a learned merge
    * list: characters, then each merge applied in rank order as a chained
    * map-only [[NativeExpressions.BpeMergeApply]] kernel — the merges are
    * expression constants, so encoding never joins or shuffles.
    *
    * This chain is the right shape for a BOUNDED merge list (one kernel
    * per merge). A production vocabulary (tens of thousands of merges)
    * would instead broadcast the trainer's final `word → tokens`
    * dictionary (the t_k state the oracle materializes) and encode by
    * broadcast lookup + char-level fallback for out-of-vocabulary words —
    * same result, one hash lookup per word.
    */
  def encodeTokens(word: org.apache.spark.sql.Column, merges: Seq[Merge]): org.apache.spark.sql.Column =
    merges.sortBy(_.mergeRank).foldLeft(array_remove(split(word, ""), "")) {
      (toks, m) => NativeExpressions.bpeMergeApply(toks, m.leftSym, m.rightSym)
    }
}
