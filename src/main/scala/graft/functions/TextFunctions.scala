package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, all as pure
  * Catalyst expressions (higher-order functions, no UDFs) so they stay in
  * whole-stage codegen and scale as map-only projections — no shuffle, no
  * driver involvement, linear in corpus size.
  */
object TextFunctions {

  /** Whitespace tokens (split on runs of whitespace). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: word-chunks + digits + punctuation as separate
    * tokens — a regex approximation of byte-pair pretokenization.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""[A-Za-z]+|\d+|[^\sA-Za-z\d]"""), lit(0)))

  /** Quality-scoring features: char/word counts, avg word length, stopword
    * ratio, alpha-char ratio. Deterministic, locale-free.
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordCount(text: Column): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*)))
  }

  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Simple linear quality score in [0,1]: rewards stopword presence and
    * mid-range length; penalizes very short docs. Weights are arbitrary but
    * fixed — the shape mirrors published heuristic quality filters.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val swRatio = when(nTok > 0, stopwordCount(text) / nTok).otherwise(lit(0.0))
    val lengthTerm = least(nTok / lit(100.0), lit(1.0))
    // floor-based HALF_UP — the repo-wide cross-engine rounding rule
    floor(least(lit(1.0), lit(0.5) * swRatio + lit(0.3) * lengthTerm + lit(0.2) * alphaRatio(text))
      * 10000 + 0.5) / 10000
  }

  /** Language-ID by marker-token voting: score per language = number of
    * tokens found in that language's marker list; predict argmax with a
    * fixed tie-break order. A real system would use character n-gram
    * profiles; the plumbing (per-doc scoring → argmax) is identical.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"))

  def langScore(text: Column, lang: String): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(langMarkers(lang).map(lit(_)): _*)))
  }

  def predictedLang(text: Column): Column = {
    // argmax with deterministic priority en > es > fr > de on ties
    val en = langScore(text, "en"); val es = langScore(text, "es")
    val fr = langScore(text, "fr"); val de = langScore(text, "de")
    val m = greatest(en, es, fr, de)
    when(m === 0, lit("unknown"))
      .when(en === m, "en").when(es === m, "es")
      .when(fr === m, "fr").otherwise("de")
  }

  /** Polynomial rolling-hash document fingerprint over characters:
    * h = fold(h*31 + code) mod 1e9+7, seeded with 7. Implemented with the
    * `aggregate` higher-order function — sequential fold, deterministic,
    * cross-engine reproducible (same fold in ANSI SQL via list_reduce).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(7L),
      (acc, code) => pmod(acc * 31L + code, lit(1000000007L)))

  /** Word n-gram shingles of a document, as an array column. Native
    * single-pass kernel — see [[NativeExpressions.WordShingles]] for why
    * the `transform`/`slice` HOF composition is not used.
    */
  def wordShingles(text: Column, n: Int): Column =
    NativeExpressions.wordShingles(text, n)
}
