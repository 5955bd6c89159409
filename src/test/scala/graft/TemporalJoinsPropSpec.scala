package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: asOfJoin's union + running-last formulation must equal
  * the brute-force definition — for each left row, the right row with the
  * max (rts, ord) among rts <= lts on the same key — on ARBITRARY inputs,
  * in particular: duplicate timestamps on either side, a right row at
  * exactly the left ts (visible), keys with no right rows (null match),
  * and multiple right rows sharing one rts (greatest ord wins). The
  * hand-picked cases in TemporalJoinsSpec pin the semantics; this sweeps
  * the space around them.
  */
class TemporalJoinsPropSpec extends SparkSpec {
  import spark.implicits._

  // Small domains on purpose: collisions in key and ts are the interesting
  // cases, and a 20-value ts domain over ~15 rows forces plenty of them.
  private val genRows: Gen[(List[(Int, Long)], List[(Int, Long, Long)])] = for {
    nl <- Gen.choose(1, 15)
    nr <- Gen.choose(0, 15)
    left <- Gen.listOfN(nl, for {
      k <- Gen.choose(0, 3); ts <- Gen.choose(0L, 19L)
    } yield (k, ts))
    right <- Gen.listOfN(nr, for {
      k <- Gen.choose(0, 3); ts <- Gen.choose(0L, 19L); v <- Gen.choose(0L, 999L)
    } yield (k, ts, v))
  } yield (left, right)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("rangeJoinCount ≡ brute-force windowed count over 40 random instances") {
    // tiny 7 µs window over a 30-value µs domain: every instance is dense
    // with bin-boundary cases, and the NEGATIVE µs values (pre-epoch
    // timestamps) exercise the `div` bin assignment's truncation-toward-
    // zero for both probe and the 2-bin build explode
    val W = 7L
    val genInst: Gen[(List[(Int, Long)], List[(Int, Long)])] = for {
      np <- Gen.choose(1, 15)
      nb <- Gen.choose(0, 15)
      probe <- Gen.listOfN(np, for {
        k <- Gen.choose(0, 3); us <- Gen.choose(-10L, 19L)
      } yield (k, us))
      build <- Gen.listOfN(nb, for {
        k <- Gen.choose(0, 3); us <- Gen.choose(-10L, 19L)
      } yield (k, us))
    } yield (probe, build)
    for (seed <- 1L to 40L) {
      val (probeRows, buildRows) = sample(genInst, seed)
      val probe = probeRows.zipWithIndex.map { case ((k, us), i) =>
        (k.toLong, TimeUs.toTs(us), i.toLong) }.toDF("key", "pts", "pid")
      val build = buildRows.map { case (k, us) => (k.toLong, TimeUs.toTs(us)) }
        .toDF("key", "bts")
      val got = TemporalJoins
        .rangeJoinCount(probe, build, "key", "pts", "bts", "pid", windowMicros = W)
        .select("pid", "window_count").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      probeRows.zipWithIndex.foreach { case ((k, pus), i) =>
        val expected = buildRows.count(b => b._1 == k && b._2 >= pus - W && b._2 < pus)
        assert(got(i.toLong) == expected.toLong,
          s"seed=$seed probe#$i key=$k pus=$pus: got ${got(i.toLong)}, want $expected")
      }
    }
  }

  test("asOfJoin ≡ brute-force backward match over 40 random instances") {
    for (seed <- 1L to 40L) {
      val (leftRows, rightRows) = sample(genRows, seed)
      // unique ord per right row (its index) — the tie-break the contract names
      val rightOrd = rightRows.zipWithIndex.map { case ((k, ts, v), i) => (k, ts, i.toLong, v) }

      val left = leftRows.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
        .toDF("key", "lts", "lid")
      val right = rightOrd.toDF("key", "rts", "ord", "payload")

      val got = TemporalJoins.asOfJoin(left, right, "key", "lts", "rts", "ord", Seq("payload"))
        .select(col("lid"), col("asof.ord").as("mord"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      leftRows.zipWithIndex.foreach { case ((k, lts), i) =>
        val expected = rightOrd.filter(r => r._1 == k && r._2 <= lts)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(i.toLong) == expected,
          s"seed=$seed left#$i key=$k lts=$lts: got ${got(i.toLong)}, want $expected")
      }
    }
  }
}
