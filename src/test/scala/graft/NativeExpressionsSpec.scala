package graft

import graft.functions.{NativeExpressions, TextFunctions}
import org.apache.spark.sql.functions._

/** The native kernels must agree exactly with their higher-order-function
  * reference formulations (which in turn match the DuckDB oracle folds).
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = {
    (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
  }

  test("DotProduct is bit-identical to the sequential HOF fold") {
    val df = Seq(
      (Array(1.0f, 2.5f, -3.25f), Array(0.5f, 1.5f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)),
      (Array.fill(64)(0.123f), Array.fill(64)(-0.456f))
    ).toDF("a", "b")
    val rows = df.select(
      NativeExpressions.dotProduct($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct null semantics: null array → null; length mismatch → null") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),
      (None: Option[Array[Float]], Some(Array(1.0f)))
    ).toDF("a", "b")
    val rows = df.select(NativeExpressions.dotProduct($"a", $"b")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("WordShingles equals the transform/slice formulation") {
    val texts = Seq("the quick brown fox jumps", "a b", "one", "", "x  y   z")
    val df = texts.toDF("t")
    val w = split($"t", "\\s+")
    val hof = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1), i => concat_ws(" ", slice(w, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(
      TextFunctions.wordShingles($"t", 2).as("native"), hof.as("hof")).collect()
    rows.foreach { r => assert(r.getSeq[String](0) == r.getSeq[String](1)) }
  }

  test("MinHash: identical shingle sets → identical signatures; est ≈ jaccard") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val df = Seq(a, a, "w1 w2 w3 w4 w5 w6 w7 w8 w9 zz").toDF("t")
    val sigs = df.select(NativeExpressions.minhashSignature(
      TextFunctions.wordShingles($"t", 1), 64)).collect()
      .map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1)) // identical text → identical signature
    val est = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }.toDouble / 64
    // true word-set jaccard = 9/11 ≈ 0.818; 64 hashes → est within ±0.25
    assert(math.abs(est - 9.0 / 11) < 0.25, s"est=$est")
  }

  test("SimHash: identical text → distance 0, similar text → small distance") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val similar = (1 to 38).map(i => s"tok$i").mkString(" ") + " a b"
    val other = (100 to 140).map(i => s"u$i").mkString(" ")
    val df = Seq(base, base, similar, other).toDF("t")
    val sigs = df.select(graft.functions.Dedup.simhash($"t")).collect().map(_.getLong(0))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sigs(0), sigs(1)) == 0)
    assert(ham(sigs(0), sigs(2)) < ham(sigs(0), sigs(3)))
  }

  test("Md5SimHash64 equals an independent JVM reference (bit layout pinned)") {
    // The DuckDB oracle recomputes the signature from md5 hex nibbles, so
    // the kernel's bit layout is a cross-engine CONTRACT: token pattern =
    // first 8 digest bytes read big-endian, vote > 0 ⟹ bit set. This
    // reference implementation derives it independently (BigInteger over
    // the digest) — a kernel byte-order or sign slip breaks here before
    // it breaks the oracle hash.
    def reference(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      text.split("\\s+").foreach { t =>
        val d = md.digest(t.getBytes("UTF-8"))
        val h = new java.math.BigInteger(1, d.take(8)) // big-endian, unsigned
        (0 until 64).foreach { b =>
          if (h.testBit(b)) votes(b) += 1 else votes(b) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val texts = Seq(
      "the quick brown fox",
      "one",
      "a b c d e f g h i j k l m n o p",
      "unicode tökens über ærger")
    val got = texts.toDF("t")
      .select(NativeExpressions.simhash64Md5(graft.functions.TextFunctions.tokens($"t")))
      .collect().map(_.getLong(0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g == reference(t), s"kernel/reference mismatch for '$t'")
    }
  }

  test("HyperplaneBuckets: deterministic; identical vectors share all buckets") {
    val v = Array.tabulate(16)(i => (i * 0.3f) - 2f)
    val df = Seq(v, v, v.map(x => -x)).toDF("e")
    val rows = df.select(NativeExpressions.hyperplaneBuckets($"e", 4, 8)).collect()
      .map(_.getSeq[Long](0))
    assert(rows(0) == rows(1))
    // negated vector flips every sign bit → shares no bucket with the original
    assert(rows(0).zip(rows(2)).forall { case (x, y) => x != y })
  }

  test("hyperplaneCoeffInt: pinned values (sim_ann_lsh oracle contract)") {
    // Independently derived (pure-python xxh64 cross-checked against the
    // JVM's xxhash64 expression). The sim_ann_lsh DuckDB oracle embeds
    // these integers as literals — a generator change that slips past this
    // pin would silently re-bucket the kernel away from its oracle.
    assert((0 until 5).map(NativeExpressions.hyperplaneCoeffInt(0, 0, _)) ==
      Seq(1846304L, 1187829L, 70805L, 251387L, 1341159L))
    assert(NativeExpressions.hyperplaneCoeffInt(7, 7, 63) == 1990150L)
    assert(NativeExpressions.hyperplaneCoeffInt(3, 5, 17) == 1502672L)
  }

  test("RepetitionStats: token/distinct/top-bigram counts, single-token edge") {
    val df = Seq("a b a b c", "solo", "x x x x").toDF("t")
    val rows = df.select(graft.functions.NativeExpressions.repetitionStats(col("t")).as("s"))
      .select("s.n_tok", "s.n_distinct", "s.top_bigram").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows(0) == ((5, 3, 2)))  // "a b" occurs twice
    assert(rows(1) == ((1, 1, 0)))  // no bigrams
    assert(rows(2) == ((4, 1, 3)))  // "x x" three times
  }

  test("CharEntropyStats: uniform/degenerate entropy, whitespace exclusion, non-ASCII path") {
    val df = Seq("abcd", "aaaa", "a b\tc\nd", "日a日a").toDF("t")
    val rows = df.select(graft.functions.NativeExpressions.charEntropyStats(col("t")).as("s"))
      .select("s.n_chars", "s.sum_clnc").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    def entropy(n: Long, s: Double) = math.log(n.toDouble) - s / n
    assert(rows(0) == ((4L, 0.0)) && entropy(4, 0.0) == math.log(4.0),
      "4 distinct chars → uniform entropy ln 4")
    assert(rows(1)._1 == 4L && entropy(4, rows(1)._2) == 0.0,
      "single repeated char → zero entropy")
    assert(rows(2) == rows(0), "whitespace (space/tab/newline) never counts")
    assert(rows(3)._1 == 4L &&
      math.abs(entropy(4, rows(3)._2) - math.log(2.0)) < 1e-12,
      "non-ASCII chars take the ordered TreeMap path: two symbols × two → ln 2")
  }

  test("CharEntropyStats: tx_entropy's projection yields (0, NULL) for empty docs, no error") {
    // the tx_entropy query keeps empty docs as n_chars=0 / entropy NULL
    // (ln(0) null-propagates) — assert that path evaluates rather than
    // throwing, since the shipped corpora never exercise it
    val df = Seq((1L, ""), (2L, " \t "), (3L, "ab")).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.NativeExpressions.charEntropyStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_chars").as("n_chars"),
        (floor((log(col("st.n_chars")) - col("st.sum_clnc") / col("st.n_chars"))
          * 10000 + 0.5) / 10000).as("entropy"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getLong(1) == 0L && rows(0).isNullAt(2), "empty text → (0, NULL)")
    assert(rows(1).getLong(1) == 0L && rows(1).isNullAt(2), "whitespace-only → (0, NULL)")
    assert(rows(2).getLong(1) == 2L && rows(2).getDouble(2) == math.floor(
      math.log(2.0) * 10000 + 0.5) / 10000)
  }
}
