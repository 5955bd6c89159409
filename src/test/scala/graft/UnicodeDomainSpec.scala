package graft

import org.apache.spark.sql.functions._

/** Pins the ASCII domain contract of the cross-engine edit-distance and
  * token-window surfaces (r17 verdict task: j13_fuzzy_join's probe corpus
  * is ASCII by construction, so its unicode behavior was only
  * incidentally covered by the r16 plants).
  *
  * The facts pinned here were MEASURED on both engines this round:
  *
  *   - Spark's `levenshtein` counts CODE-POINT edits: 'é'→'e' = 1,
  *     astral '𝕏'→'X' = 1.
  *   - DuckDB's `levenshtein` counts BYTE edits over UTF-8: 'é'→'e' = 2,
  *     '𝕏'→'X' = 4, 'ß'→'ẞ' = 3 (2-byte vs 3-byte char).
  *
  * The two agree exactly on ASCII×ASCII (every char is one byte and one
  * code point) and NOWHERE else in general — so j13's contract is an
  * ASCII input domain, like TextFunctions.asciiLower's tokenizer
  * contract, rather than a unicode fuzz plant that would manufacture a
  * known, unfixable divergence. This spec (a) pins Spark's side of the
  * measured divergence so an engine upgrade that changes unit semantics
  * is caught, (b) asserts the actual testdata keeps j13 inside the
  * agreeing domain, and (c) pins the tokenizer's unicode-whitespace
  * boundary that tx_chunk's token windows inherit (both engines' \s+ is
  * ASCII-only: Java regex default and RE2 agree NBSP/U+2028/U+3000 are
  * NOT separators).
  */
class UnicodeDomainSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(levenshtein(col("a"), col("b"))).head().getInt(0)
  }

  test("Spark levenshtein counts code points, not bytes or UTF-16 units (the measured DuckDB divergence)") {
    assert(lev("é", "e") == 1, "2-byte char substitution must be ONE code-point edit (DuckDB: 2, byte model)")
    assert(lev("𝕏a", "Xa") == 1, // 𝕏 U+1D54F, astral
      "astral-char substitution must be ONE edit even though it is 2 UTF-16 units / 4 UTF-8 bytes (DuckDB: 4)")
    assert(lev("ß", "ẞ") == 1, "2-byte→3-byte substitution must be ONE edit (DuckDB: 3)")
    assert(lev("αβγ", "abγ") == 2, "two substitutions regardless of byte widths (DuckDB: 4)")
  }

  test("thresholded levenshtein equals the unbounded distance inside the band on unicode too") {
    import spark.implicits._
    val pairs = Seq(("é", "e"), ("𝕏a", "Xa"), ("ßx", "ẞy"), ("abc", "abc"))
    val df = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b")).as("full"),
        levenshtein(col("a"), col("b"), 2).as("banded"))
    df.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"banded levenshtein must agree with the unbounded one whenever dist <= threshold: $r")
    }
  }

  test("j13's input domain is ASCII on the driver testdata (the contract that makes the engines agree)") {
    // ALL generated scale factors, not just the smallest (r17 review): the
    // oracle gate drives sf0.01 and the bench sf0.1, so a regeneration
    // that injects non-ASCII names only there must fail HERE, not flip
    // j13's nearest matches silently.
    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => s"/root/testdata/$sf/customer.parquet")
      .filter(p => new java.io.File(p).exists())
    assert(sfDirs.nonEmpty, "no driver testdata found to check the domain against")
    sfDirs.foreach { p =>
      val offenders = spark.read.parquet(p)
        .select(col("c_custkey"), col("c_name"))
        .filter(not(col("c_name").rlike("^[\\x00-\\x7F]*$")))
        .limit(5).collect()
      assert(offenders.isEmpty,
        s"customer.c_name in $p must be pure ASCII for j13's cross-engine levenshtein to be " +
          s"well-defined; found: ${offenders.mkString(", ")} — renegotiate the j13 domain " +
          "contract (Queries.scala j13 scaladoc)")
    }
  }

  test("tokenizer whitespace is ASCII-only on both engines: NBSP/U+2028/U+3000 are NOT token separators") {
    import spark.implicits._
    // Java regex \s (no UNICODE_CHARACTER_CLASS) = [ \t\n\x0B\f\r];
    // DuckDB's RE2 \s = [\t\n\f\r\v ]. Same set — so a unicode space must
    // glue, not split, in BOTH engines, and tx_chunk's token windows
    // stay aligned across them on the r16 unicode-planted corpora.
    val texts = Seq(
      "a b c",      // NBSP glues -> tokens: ["a b", "c"]
      "x y",         // LINE SEPARATOR glues -> 1 token
      "p　q r\ts")    // IDEOGRAPHIC SPACE glues; \t splits
    val got = texts.toDF("text")
      .select(functions.TextFunctions.tokens(col("text")).as("w"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("a b", "c"), s"NBSP must not separate: ${got(0)}")
    assert(got(1) == List("x y"), s"U+2028 must not separate: ${got(1)}")
    assert(got(2) == List("p　q", "r", "s"), s"U+3000 must not separate, tab must: ${got(2)}")
  }
}
