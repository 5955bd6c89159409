package graft

import graft.functions.KmvMinHashes
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The KMV invariant everything downstream rests on — the a18b oracle's
  * hash match, the streaming twin's exact batch parity, and the estimate
  * formula itself: after ANY sequence of reduces and merges over a value
  * stream, the buffer equals `distinct.sorted.take(k)` of the whole
  * stream, exactly. Attacked with random streams (heavy duplication,
  * adversarial near-k cardinalities) under random partition/merge trees.
  * No SparkSession needed — the Aggregator's reduce/merge are pure.
  */
class KmvPropSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val k = 8

  private def sketchOf(parts: Seq[Seq[Long]]): Array[Long] = {
    val agg = new KmvMinHashes(k)
    parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  test("buffer == distinct.sorted.take(k) under random merge trees") {
    // cardinality clustered around k to hammer the insert/trim boundary
    val caseGen = for {
      card <- Gen.choose(1, 3 * k)
      n <- Gen.choose(card, 300)
      vals <- Gen.listOfN(n, Gen.choose(0L, card.toLong - 1))
      cuts <- Gen.listOfN(4, Gen.choose(0, n))
    } yield (vals, cuts.sorted)
    val cases = Gen.listOfN(200, caseGen).pureApply(Gen.Parameters.default, Seed(11L))

    cases.foreach { case (vals, cuts) =>
      val bounds = (0 +: cuts :+ vals.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => vals.slice(a, b) }
      val got = sketchOf(parts).toSeq
      val want = vals.distinct.sorted.take(k)
      assert(got == want, s"vals=${vals.take(20)}... parts=${parts.map(_.size)}")
    }
  }

  test("merge is commutative and idempotent on the buffer level") {
    val agg = new KmvMinHashes(k)
    val a = (1L to 20L by 2).foldLeft(agg.zero)(agg.reduce)
    val b = (0L to 30L by 3).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a.clone(), b).toSeq == agg.merge(b.clone(), a).toSeq)
    assert(agg.merge(a.clone(), a).toSeq == a.toSeq)
  }
}
