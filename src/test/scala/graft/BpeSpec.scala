package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Bpe, NativeExpressions}

/** BPE trainer correctness: the distributed trainer must agree with a
  * straightforward sequential reference implementation (independent of
  * both the Spark kernels and the SQL oracle) — on adversarial
  * equal-symbol-run fixtures and on the real corpus.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // -- sequential reference (Sennrich-style), kept deliberately naive -----
  private def refPairCounts(vocab: Seq[(List[String], Long)]): Map[(String, String), Long] =
    vocab.flatMap { case (toks, c) =>
      toks.zip(toks.drop(1)).map(p => p -> c)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  private def refApply(toks: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) { out += (a + b); i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(words: Seq[String], k: Int): Seq[(Long, String, String, Long)] = {
    var vocab = words.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (w, ws) => (w.map(_.toString).toList, ws.length.toLong) }
    (1 to k).flatMap { r =>
      val pc = refPairCounts(vocab)
      if (pc.isEmpty) None
      else {
        val ((a, b), cnt) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        vocab = vocab.map { case (t, c) => (refApply(t, a, b), c) }
        Some((r.toLong, a, b, cnt))
      }
    }
  }

  private def trainOn(words: Seq[String], k: Int): Seq[(Long, String, String, Long)] = {
    val wf = words.toDF("word").groupBy("word").agg(count(lit(1)).as("c"))
    Bpe.trainMerges(wf, k).map(m => (m.mergeRank, m.leftSym, m.rightSym, m.pairCount))
  }

  test("BpeMergeApply: greedy-left non-overlapping semantics") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("b", "a", "a"),
      Seq("a", "b", "a", "b"), Seq("a"), Seq[String]()).toDF("toks")
    val got = df.select(NativeExpressions.bpeMergeApply(col("toks"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got.toList == List(
      List("aa", "a"), List("aa", "aa"), List("b", "aa"),
      List("a", "b", "a", "b"), List("a"), Nil))
  }

  test("AdjacentPairs: all adjacent positions, [] under length 2") {
    val df = Seq(Seq("x", "y", "z"), Seq("x"), Seq[String]()).toDF("toks")
    val got = df.select(NativeExpressions.adjacentPairs(col("toks")).as("p"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getString(1))).toList)
    assert(got.toList == List(List(("x", "y"), ("y", "z")), Nil, Nil))
  }

  test("BpeMergeApply/AdjacentPairs: property — agree with the reference on random arrays") {
    // random token arrays over a tiny alphabet (maximizes runs/overlaps)
    // and random merge pairs, deterministic seed
    val symGen = Gen.oneOf("a", "b", "ab", "ba")
    val caseGen = for {
      toks <- Gen.listOfN(12, symGen)
      a <- symGen
      b <- symGen
    } yield (toks, a, b)
    val cases = Gen.listOfN(200, caseGen)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val df = cases.zipWithIndex
      .map { case ((t, a, b), i) => (i, t, a, b) }.toDF("i", "toks", "a", "b")
    // group cases by merge pair so the pair stays an expression constant
    cases.map { case (_, a, b) => (a, b) }.distinct.foreach { case (a, b) =>
      val got = df.filter(col("a") === a && col("b") === b)
        .select(col("i"), NativeExpressions.bpeMergeApply(col("toks"), a, b).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
      got.foreach { case (i, m) =>
        val (t, _, _) = cases(i)
        assert(m == refApply(t, a, b), s"case $i: toks=$t pair=($a,$b)")
      }
    }
    // adjacent pairs agree with zip-based reference
    val gotPairs = df.select(col("i"),
        NativeExpressions.adjacentPairs(col("toks")).as("p"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getString(1))).toList).toMap
    gotPairs.foreach { case (i, p) =>
      val (t, _, _) = cases(i)
      assert(p == t.zip(t.drop(1)), s"case $i")
    }
  }

  test("trainMerges matches the sequential reference on equal-symbol runs") {
    val words = Seq("aaaa", "aaa", "aa", "abab", "aab", "baaa", "aaaaa")
      .flatMap(w => Seq.fill(3)(w)) ++ Seq.fill(5)("xy")
    assert(trainOn(words, 5) == refTrain(words, 5))
  }

  test("encodeTokens: kernel chain equals the sequential reference per word") {
    val words = Seq("lower", "lowest", "aaa", "banana", "x", "stationery")
    val corpus = words.flatMap(w => Seq.fill(2)(w)) // freqs irrelevant to equality
    val wf = corpus.toDF("word").groupBy("word").agg(count(lit(1)).as("c"))
    val merges = Bpe.trainMerges(wf, 4)
    val got = words.toDF("word")
      .select(col("word"), Bpe.encodeTokens(col("word"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val expected = words.map { w =>
      w -> merges.foldLeft(w.map(_.toString).toList)((t, m) => refApply(t, m.leftSym, m.rightSym))
    }.toMap
    assert(got == expected)
  }

  test("vocab cap: training runs on the top-V frequency head, ties word-lexicographic") {
    // the MaxVocabWords degrade path fires only above 2^20 distinct
    // words in production — exercise the mechanical contract at cap=2:
    // train set = top-2 by (count desc, word), i.e. "lower" (10) plus
    // "lowest" — which wins its 8-8 count tie against "widest" ONLY via
    // the word-lexicographic tie-break the oracle's `wfc` CTE replays —
    // equal to the reference trained on exactly that head
    val corpus = Seq.fill(10)("lower") ++ Seq.fill(8)("lowest") ++
      Seq.fill(8)("widest") ++ Seq.fill(2)("rare") ++ Seq("hapax")
    val wf = corpus.toDF("word").groupBy("word").agg(count(lit(1)).as("c"))
    val got = Bpe.trainMerges(wf, 4, maxVocabWords = 2)
      .map(m => (m.mergeRank, m.leftSym, m.rightSym, m.pairCount))
    val head = Seq.fill(10)("lower") ++ Seq.fill(8)("lowest")
    assert(got == refTrain(head, 4))
    assert(got.nonEmpty)
  }

  test("trainMergesWithVocab: final state equals the kernel-chain encode per word") {
    // the r12 broadcast-dictionary encode path (tx_bpe_encode) bills each
    // word by the trainer's final tokenization — must equal re-deriving
    // the word through the chained BpeMergeApply kernels
    val words = Seq("lower", "lowest", "banana", "aaa", "stationery", "widest")
    val corpus = words.flatMap(w => Seq.fill(2)(w))
    val wf = corpus.toDF("word").groupBy("word").agg(count(lit(1)).as("c"))
    val (merges, vocab) = Bpe.trainMergesWithVocab(wf, 5)
    val enc = words.toDF("word")
      .select(col("word"), Bpe.encodeTokens(col("word"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(vocab.map(_._1).sorted == words.sorted)
    vocab.foreach { case (w, t) => assert(t.toList == enc(w), s"word $w") }
  }

  test("trainMerges matches the sequential reference on the real corpus") {
    val words = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .as[String].collect().filter(_.matches("[A-Za-z]+")).toSeq
    val got = trainOn(words, 6)
    assert(got == refTrain(words, 6))
    assert(got.length == 6)
  }
}
