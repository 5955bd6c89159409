package graft

import graft.functions.NativeExpressions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[NativeExpressions.MultiRegexpFirstMatch]] must agree
  * with Spark's own `rlike` + `regexp_extract` PER PATTERN on arbitrary
  * inputs — the kernel's whole claim is "independent first-match search,
  * just fused". Null convention mapping: a null slot ⟺ the pattern does
  * not match (`rlike` false); on a match the slot equals
  * `regexp_extract(text, p, g)` (which returns "" for an empty capture —
  * same value the kernel stores).
  */
class MultiRegexpPropSpec extends SparkSpec {
  import spark.implicits._

  // the parser's real field-pattern shapes plus adversarial overlaps
  private val patterns = Seq(
    """from ([\d\.]+)|\[(\d+\.\d+\.\d+\.\d+)\]""",
    """user=(\S+)""",
    """ruser=([^\s]*)""",
    """port (\d+)""",
    """uid=(\d+)""",
    """ssh(\d)""")
  private val groupCounts = patterns.map(p =>
    java.util.regex.Pattern.compile(p).matcher("").groupCount())
  private val offsets = NativeExpressions.multiRegexpSlotOffsets(patterns)

  private val fragment: Gen[String] = Gen.oneOf[Gen[String]](
    Gen.const(Gen.const("from 10.0.3.4")),
    Gen.const(Gen.const("[192.168.1.2]")),
    for (u <- Gen.alphaLowerStr.map(_.take(5))) yield s"user=$u",
    for (u <- Gen.alphaLowerStr.map(_.take(5))) yield s"ruser=$u",
    Gen.const(Gen.const("ruser=")), // empty capture
    for (p <- Gen.choose(1, 65535)) yield s"port $p",
    for (u <- Gen.choose(0, 9999)) yield s"uid=$u",
    Gen.const(Gen.const("euid=7")), // uid= matches inside euid=
    Gen.const(Gen.const("ssh2")),
    Gen.asciiPrintableStr.map(_.take(8))
  ).flatMap(identity)

  private val line: Gen[String] =
    Gen.listOfN(6, fragment).map(_.mkString(" "))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("fused kernel ≡ per-pattern rlike + regexp_extract on generated lines") {
    (1L to 10L).foreach { seed =>
      val lines = sample(Gen.listOfN(40, line), seed)
      val df = lines.toDF("t").select(
        col("t"),
        NativeExpressions.multiRegexpFirstMatch(col("t"), patterns).as("f"))
      val refCols = patterns.zipWithIndex.flatMap { case (p, i) =>
        Seq(col("t").rlike(p).as(s"m$i")) ++
          (1 to groupCounts(i)).map(g => regexp_extract(col("t"), p, g).as(s"x${i}_$g"))
      }
      df.select((col("t") +: col("f") +: refCols): _*).collect().foreach { r =>
        val slots = r.getSeq[String](1)
        patterns.indices.foreach { i =>
          val matches = r.getAs[Boolean](s"m$i")
          (1 to groupCounts(i)).foreach { g =>
            val slot = slots(offsets(i) + g - 1)
            val ref = r.getAs[String](s"x${i}_$g")
            if (!matches)
              assert(slot == null, s"seed=$seed line='${r.getString(0)}' p=$i g=$g: expected null")
            else if (slot != null)
              assert(slot == ref, s"seed=$seed line='${r.getString(0)}' p=$i g=$g: '$slot' != '$ref'")
            // slot == null on a matching pattern is legal only for a
            // non-participating alternation arm, where regexp_extract
            // returns "" — assert exactly that.
            else assert(ref == "",
              s"seed=$seed line='${r.getString(0)}' p=$i g=$g: null slot but extract='$ref'")
          }
        }
      }
    }
  }
}
