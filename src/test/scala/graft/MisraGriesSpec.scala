package graft

import graft.functions.MisraGries
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The two Misra-Gries guarantees the a21_heavy_hitters design rests on,
  * attacked with random streams under random partition/merge trees:
  * every key with true frequency > n/k is present in the final sketch
  * (no false negatives), and every kept estimate is within n/k of truth.
  * No SparkSession needed — the Aggregator's reduce/merge are pure.
  */
class MisraGriesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val k = 8

  private def sketchOf(parts: Seq[Seq[Long]]): Array[(Long, Long)] = {
    val agg = new MisraGries(k)
    parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  test("no false negatives and bounded underestimate, over random merge trees") {
    // Zipf-ish draw: key j with weight ~ 1/(j+1)
    val keyGen = Gen.frequency((1 to 12).map(j => (120 / j, Gen.const(j.toLong))): _*)
    val caseGen = for {
      n <- Gen.choose(50, 400)
      keys <- Gen.listOfN(n, keyGen)
      cuts <- Gen.listOfN(3, Gen.choose(0, n))
    } yield (keys, cuts.sorted)
    val cases = Gen.listOfN(150, caseGen).pureApply(Gen.Parameters.default, Seed(7L))

    cases.foreach { case (keys, cuts) =>
      val bounds = (0 +: cuts :+ keys.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => keys.slice(a, b) }
      val sketch = sketchOf(parts).toMap
      val n = keys.length
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      truth.foreach { case (key, cnt) =>
        if (cnt * k > n)
          assert(sketch.contains(key), s"hitter $key (cnt $cnt of $n) missing: $sketch")
      }
      sketch.foreach { case (key, est) =>
        val cnt = truth.getOrElse(key, 0L)
        assert(est <= cnt, s"overestimate for $key: $est > $cnt")
        assert(cnt - est <= n.toLong / k, s"error bound broken for $key: $cnt - $est > $n/$k")
      }
      assert(sketch.size <= k)
    }
  }
}
