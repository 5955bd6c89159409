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

  /** The engine's TOKENIZATION CASE FOLD: ASCII-only, via translate —
    * NOT `lower()` (r16, unicode fuzz find). Unicode case mapping is not
    * one function: the JVM applies FULL mappings ('İ' → "i̇", two code
    * points; 'ΣΙΣΥΦΟΣ' gets a contextual final sigma) while utf8proc
    * engines (DuckDB) apply SIMPLE per-code-point mappings ('İ' → 'i') —
    * so lower()-keyed tokens diverge across engines, and across ICU/
    * Unicode VERSIONS within one engine. A dedup/tf-idf key that changes
    * when a library upgrades is corpus corruption at 100 TB scale; the
    * reproducibility-first fold is ASCII-only (the convention of C4-style
    * heuristic filters), identical everywhere, and equal to lower() on
    * every ASCII corpus. Non-ASCII case variants stay distinct tokens BY
    * CONTRACT. Applies to tokenizer/marker paths over documents.text;
    * the reference's event-vocabulary folds (d8) keep true lower/upper —
    * that vocabulary is machine-generated ASCII by table contract.
    */
  def asciiLower(text: Column): Column =
    translate(text, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

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

  /** Tokens of the casefolded text that belong to the stopword list —
    * counted by the single-pass [[NativeExpressions.MarkerTokenCounts]]
    * kernel (the `filter` HOF form runs interpreted, re-splitting per
    * evaluation).
    */
  def stopwordCount(text: Column): Column =
    NativeExpressions.markerTokenCounts(asciiLower(text), Seq(stopwords)).getItem(0)

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
    Rounding.round4(least(lit(1.0),
      lit(0.5) * swRatio + lit(0.3) * lengthTerm + lit(0.2) * alphaRatio(text)))
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

  /** Fixed language order — index into [[langScores]]' output array. */
  val langOrder: Seq[String] = Seq("en", "es", "fr", "de")

  /** All four language scores from ONE tokenization pass (array column in
    * [[langOrder]] order). Queries needing several scores should project
    * this once and extract, rather than calling [[langScore]] per language.
    */
  def langScores(text: Column): Column =
    NativeExpressions.markerTokenCounts(asciiLower(text), langOrder.map(langMarkers))

  def langScore(text: Column, lang: String): Column =
    NativeExpressions.markerTokenCounts(asciiLower(text), Seq(langMarkers(lang))).getItem(0)

  /** Argmax with deterministic priority en > es > fr > de on ties, from
    * already-computed score columns (one kernel pass upstream).
    */
  def predictedFromScores(en: Column, es: Column, fr: Column, de: Column): Column = {
    val m = greatest(en, es, fr, de)
    // null scores (NULL text) must surface as null, not fall through every
    // null-valued `when` condition into the otherwise("de") arm
    when(m.isNull, lit(null).cast("string"))
      .when(m === 0, lit("unknown"))
      .when(en === m, "en").when(es === m, "es")
      .when(fr === m, "fr").otherwise("de")
  }

  def predictedLang(text: Column): Column = {
    val sc = langScores(text)
    predictedFromScores(sc.getItem(0), sc.getItem(1), sc.getItem(2), sc.getItem(3))
  }

  /** Polynomial rolling-hash document fingerprint over characters:
    * h = fold(h*31 + code) mod 1e9+7, seeded with 7. Native single-pass
    * kernel ([[NativeExpressions.FingerprintHash]]) — deterministic and
    * cross-engine reproducible (same fold in ANSI SQL via list_reduce);
    * the equivalent `aggregate`/`transform` HOF composition runs
    * interpreted with per-character boxing.
    */
  def fingerprint(text: Column): Column =
    NativeExpressions.fingerprintHash(text)

  /** Frozen hashed-n-gram linear classifier features:
    * `struct(n_feat, sum_w)` from one pass — see
    * [[NativeExpressions.HashedNgramScore]] for the determinism contract.
    */
  def classifierFeatures(text: Column): Column =
    NativeExpressions.hashedNgramScore(text)

  /** Word n-gram shingles of a document, as an array column. Native
    * single-pass kernel — see [[NativeExpressions.WordShingles]] for why
    * the `transform`/`slice` HOF composition is not used.
    */
  def wordShingles(text: Column, n: Int): Column =
    NativeExpressions.wordShingles(text, n)
}
