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
  *     than the corpus).
  *   2. The word-frequency table is collected as a BOUNDED MODEL ARTIFACT
  *     (the centroid/codebook contract of [[Similarity]]): the top
  *     [[MaxVocabWords]] words by (count desc, word) — a deterministic,
  *     mechanical cap replayed in the oracle, a no-op until the corpus'
  *     distinct-word count actually exceeds it, at which point training
  *     proceeds on the head of the frequency distribution exactly as
  *     production tokenizer trainers do (tail hapaxes contribute pair
  *     counts ≈ 0 and never win a merge anyway).
  *   3. ALL merge rounds then run driver-side on that artifact — exact
  *     greedy BPE over (tokens, count) rows, O(vocab · merges) string
  *     work. This is the r12 rewrite: the previous shape ran each round
  *     as a distributed pair-count job and collected one winner per
  *     round, which at a production merge count (10^4-10^5) means that
  *     many SEQUENTIAL driver-coordinated jobs — the scheduling alone
  *     dwarfs the vocabulary-sized compute. Real BPE trainers
  *     (SentencePiece, HF tokenizers) train in memory on word counts for
  *     the same reason; the corpus-sized work stays in stage 1.
  *   4. Merge application on documents is the codegen-friendly map-only
  *     [[NativeExpressions.BpeMergeApply]] kernel with each pair as an
  *     expression constant — no join, nothing shuffles.
  *
  * Determinism: counts are exact integers; the winning pair is
  * max-by-(count, then lexicographically-smallest pair) — reproducible on
  * any partitioning (and, post-r12, independent of partitioning by
  * construction), and re-derivable in ANSI SQL (see the tx_bpe_merges
  * oracle, which replays every round with windowed gaps-and-islands SQL).
  * Words are ASCII-alphabetic (the [[wordFrequencies]] filter), so JVM
  * String ordering ≡ UTF8 binary ordering and the driver tie-break
  * matches both engines' ORDER BY.
  */
object Bpe {

  /** Cap on the collected vocabulary artifact. Driver budget at the cap:
    * ~1M words × ~10 chars = ~10M token slots. Single-char tokens are
    * INTERNED (words are ASCII-alphabetic, so 52 shared strings cover
    * every initial token) and each round's merged token is allocated
    * once and shared, so the slots are references into a small shared
    * pool — peak transient footprint is the per-word reference arrays
    * plus the collected Rows, ~100–200 MB, a bounded one-off artifact in
    * a 100+ GB driver class (NOT "tens of MB": the per-round pair
    * HashMap is small — one entry per DISTINCT adjacent pair — but the
    * reference arrays are not). Above the cap, training runs on the
    * frequency head (top-V by count, word-lexicographic tie-break),
    * replayed verbatim in the oracle's `wfc` CTE.
    */
  val MaxVocabWords: Int = 1 << 20

  /** The corpus→vocabulary aggregation: ASCII-alphabetic whitespace tokens
    * and their exact corpus frequencies. (ASCII-only keeps per-character
    * semantics identical across engines; production would operate on
    * bytes.)
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    // spread before the split/regex kernels: a one-split corpus file would
    // tokenize on one core (Guards.spread; identity at cluster width)
    graft.operators.Guards.spread(docs.select(col(textCol)))
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word").rlike("^[A-Za-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("c"))

  final case class Merge(mergeRank: Long, leftSym: String, rightSym: String, pairCount: Long)

  /** `k` greedy merge rounds over a (word, c) frequency table. Returns the
    * learned merge list (rank, left, right, pair count at selection time).
    *
    * One bounded collect (the [[MaxVocabWords]] artifact), then exact
    * greedy rounds driver-side: per round, weighted adjacent-pair counts
    * over every word's token array, winner by (count desc, a, b),
    * greedy-left application (after a merge at position i, scanning
    * resumes at i+2 — the semantics [[NativeExpressions.BpeMergeApply]]
    * and the oracle's gaps-and-islands CTEs implement). Training stops
    * early when no pair remains (every word fused to one token).
    */
  def trainMerges(wordFreq: DataFrame, k: Int,
                  maxVocabWords: Int = MaxVocabWords): Seq[Merge] =
    trainMergesWithVocab(wordFreq, k, maxVocabWords)._1

  /** [[trainMerges]] plus the trainer's FINAL tokenization state
    * (`word → subword tokens` after all merges) — the artifact a
    * production-size vocabulary encodes through: one broadcast hash
    * lookup per word instead of a merges-deep kernel chain (see
    * [[encodeTokens]]). Comes free from the driver-side rounds; bounded
    * by the same [[MaxVocabWords]] cap.
    */
  def trainMergesWithVocab(wordFreq: DataFrame, k: Int,
                           maxVocabWords: Int = MaxVocabWords): (Seq[Merge], Seq[(String, Seq[String])]) = {
    val rows = wordFreq.orderBy(desc("c"), col("word")).limit(maxVocabWords)
      .select(col("word"), col("c").cast("long")).collect()
    val toks: Array[Array[String]] = new Array(rows.length)
    val cnts: Array[Long] = new Array(rows.length)
    // Intern single-char tokens: registered callers feed ASCII-alphabetic
    // words, so every initial token is one of 52 shared strings — without
    // this, the cap allocates ~10M one-char String objects (hundreds of MB
    // transient). The pool only covers ASCII; this is a public API, so any
    // char >= 128 falls back to a fresh one-char string instead of an
    // out-of-bounds pool index.
    val charPool: Array[String] = Array.tabulate(128)(c => c.toChar.toString)
    var wi = 0
    while (wi < rows.length) {
      val w = rows(wi).getString(0)
      val arr = new Array[String](w.length)
      var ci = 0
      while (ci < w.length) {
        val c = w.charAt(ci)
        arr(ci) = if (c < 128) charPool(c.toInt) else c.toString
        ci += 1
      }
      toks(wi) = arr
      cnts(wi) = rows(wi).getLong(1)
      wi += 1
    }
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      wi = 0
      while (wi < toks.length) {
        val t = toks(wi)
        var i = 0
        while (i < t.length - 1) {
          val key = (t(i), t(i + 1))
          pairCounts.update(key, pairCounts.getOrElse(key, 0L) + cnts(wi))
          i += 1
        }
        wi += 1
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((a, b), cnt) = pairCounts.minBy { case ((pa, pb), c) => (-c, pa, pb) }
        merges += Merge(r.toLong, a, b, cnt)
        val ab = a + b // allocate the merged token ONCE, shared by every fusion
        wi = 0
        while (wi < toks.length) {
          toks(wi) = applyMergeGreedyLeft(toks(wi), a, b, ab)
          wi += 1
        }
      }
      r += 1
    }
    val vocab = Seq.newBuilder[(String, Seq[String])]
    wi = 0
    while (wi < rows.length) {
      vocab += ((rows(wi).getString(0), toks(wi).toSeq))
      wi += 1
    }
    (merges.result(), vocab.result())
  }

  /** Greedy-left single-pair application: scan left to right, fuse every
    * non-overlapping (a, b) adjacency, resume AFTER the fused token (so
    * "aaa" under (a,a) yields ["aa","a"], never ["a","aa"]).
    */
  private def applyMergeGreedyLeft(t: Array[String], a: String, b: String,
                                   ab: String): Array[String] = {
    if (t.length < 2) return t
    val out = Array.newBuilder[String]
    var i = 0
    while (i < t.length) {
      if (i < t.length - 1 && t(i) == a && t(i + 1) == b) { out += ab; i += 2 }
      else { out += t(i); i += 1 }
    }
    out.result()
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
