package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("Hello world, 42 tokens!").toDF("t")
    val r = df.select(
      TextFunctions.tokenCount($"t"),
      TextFunctions.bpeishTokenCount($"t")).head()
    assert(r.getInt(0) == 4)
    // [Hello][world][,][42][tokens][!] = 6
    assert(r.getInt(1) == 6)
  }

  test("stopword count and alpha ratio") {
    val df = Seq("the cat and the dog in a box").toDF("t")
    val r = df.select(
      TextFunctions.stopwordCount($"t"),
      TextFunctions.alphaRatio($"t")).head()
    assert(r.getInt(0) == 5) // the, and, the, in, a
    // 21 letters / 28 chars
    assert(math.abs(r.getDouble(1) - 21.0 / 28) < 1e-12)
  }

  test("language id: marker voting with argmax") {
    val df = Seq(
      "the cat of the house and a dog",
      "el perro de la casa que ladra",
      "le chat et la maison les arbres",
      "der hund und die katze das haus",
      "xyzzy plugh quux").toDF("t")
    val out = df.select(TextFunctions.predictedLang($"t")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "es", "fr", "de", "unknown"))
  }

  test("fingerprint: polynomial rolling hash matches hand computation") {
    val s = "ab"
    val expected = ((7L * 31 + 'a'.toLong) % 1000000007L * 31 + 'b'.toLong) % 1000000007L
    val r = Seq(s).toDF("t").select(TextFunctions.fingerprint($"t")).head()
    assert(r.getLong(0) == expected)
  }

  // The native kernels must be drop-in replacements for the HOF forms the
  // DuckDB oracles were written against — assert bit-identical results on
  // edge cases (empty string, leading/trailing whitespace, punctuation).
  private val edgeTexts = Seq(
    "", " ", "a", "ab", "the cat and the dog in a box", " leading", "trailing ",
    "  double  spaces  ", "the the the", "punct, marks! and-digits 42",
    "el perro de la casa", "THE Cat AND a dog")

  test("fingerprint kernel ≡ aggregate/transform/split HOF fold") {
    val hof = aggregate(
      transform(split($"t", ""), ch => ascii(ch).cast("long")),
      lit(7L),
      (acc, code) => pmod(acc * 31L + code, lit(1000000007L)))
    edgeTexts.toDF("t")
      .select(TextFunctions.fingerprint($"t").as("k"), hof.as("h"))
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("marker-count kernel ≡ filter-HOF size over split tokens") {
    def hofCount(markers: Seq[String]) =
      size(filter(split(lower($"t"), "\\s+"), t => t.isin(markers.map(lit(_)): _*)))
    val sets = TextFunctions.stopwords +: TextFunctions.langOrder.map(TextFunctions.langMarkers)
    val kernel = graft.functions.NativeExpressions
      .markerTokenCounts(lower($"t"), sets)
    edgeTexts.toDF("t")
      .select(kernel.as("k"), array(sets.map(hofCount): _*).as("h"))
      .collect().foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1), r))
  }

  test("wordShingles: n=2 over 4 tokens gives 3 shingles") {
    val r = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordShingles($"t", 2)).head()
    assert(r.getSeq[String](0) == Seq("a b", "b c", "c d"))
  }
}
