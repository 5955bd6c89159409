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

  // Naive reference for the hashed-n-gram classifier kernel: materialize
  // every feature string, hash it with the repo rolling hash, sum weights.
  // The kernel computes the same thing in one pass with no substrings.
  // Tokenization uses RE2's \s class (the oracle's regex engine): space,
  // \t, \n, \f, \r — NOT Java \s, which also includes vertical tab 0x0B.
  private def classifierRef(text: String): (Long, Long) = {
    val P = 1000000007L
    def h(s: String): Long = s.codePoints().toArray
      .foldLeft(7L)((a, c) => (a * 31L + c) % P)
    def w(x: Long): Long = ((x % 1048576L) * 2654435761L) % 1048576L - 524288L
    val toks = text.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty)
    val feats = toks.toSeq ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    (feats.size.toLong, feats.map(f => w(h(f))).sum)
  }

  test("hashedNgramScore kernel ≡ materialized unigram+bigram reference") {
    val randomSoup = {
      val words = Seq("the", "cat", "über", "42", "a,b", "x", "wordy", "ab")
      val rnd = new scala.util.Random(42)
      Seq.fill(200)(Seq.fill(rnd.nextInt(12))(
        (if (rnd.nextBoolean()) " " else "  \t") + words(rnd.nextInt(words.length))
      ).mkString + (if (rnd.nextBoolean()) " " else ""))
    }
    // vertical tab is NOT a separator: "a\u000Bb" must be ONE token
    (edgeTexts ++ randomSoup ++ Seq("a\u000Bb", "a b \fc")).toDF("t")
      .select($"t", TextFunctions.classifierFeatures($"t").as("st"))
      .collect().foreach { r =>
        val s = r.getStruct(1)
        assert(classifierRef(r.getString(0)) == ((s.getLong(0), s.getLong(1))),
          s"for input '${r.getString(0)}'")
      }
  }

  test("regexpReplaceMany ≡ sequential regexp_replace chain + count scans") {
    val emailPat = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val userPat = "\\bu\\d+\\b"
    val lines = Seq(
      "", "no pii here", "u5@mail.example.com", "u5", "10.0.1.2",
      "Failed password for u42 from 10.0.37.142 port 2211 ssh2 contact=u42@mail.example.com relay=192.168.11.92",
      "u1 u2 u3", "a@b x@y.z", "1.2.3.4 5.6.7.8", "edge u7@h end u8 9.9.9.9",
      "xu5@mail.example.com not-a-handle-start", "u5@ trailing-at")
    def occurrences(c: org.apache.spark.sql.Column, token: String) =
      ((length(c) - length(call_function("replace", c, lit(token), lit("")))) / token.length)
        .cast("long")
    val chain = lines.toDF("t")
      .withColumn("t1", regexp_replace($"t", emailPat, "<EMAIL>"))
      .withColumn("redacted",
        regexp_replace(regexp_replace($"t1", ipPat, "<IP>"), userPat, "<USER>"))
      .select($"t", occurrences($"t1", "<EMAIL>").as("e"),
        occurrences($"redacted", "<IP>").as("i"),
        occurrences($"redacted", "<USER>").as("u"), $"redacted")
    val kernel = lines.toDF("t")
      .select($"t", graft.functions.NativeExpressions.regexpReplaceMany(
        $"t", Seq(emailPat, ipPat, userPat), Seq("<EMAIL>", "<IP>", "<USER>")).as("r"))
    val ch = chain.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    kernel.collect().foreach { r =>
      val s = r.getStruct(1)
      val counts = s.getSeq[Long](1)
      assert(ch(r.getString(0)) == ((counts(0), counts(1), counts(2), s.getString(0))),
        s"for input '${r.getString(0)}'")
    }
  }
}
