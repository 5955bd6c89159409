package graft

import graft.functions.Eval
import org.apache.spark.sql.functions._

/** Hand-computed rank-sum AUC values, including the tie-handling the
  * histogram formulation must reproduce exactly.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) = {
    val r = Eval.aucExact(rows.toDF("s", "pos"), col("s"), col("pos")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("ties get average ranks: scores [1,2,2,3], pos at {3,2} -> AUC 0.875") {
    // asc ranks: 1->1, the two 2s -> 2.5 each, 3 -> 4; R+ = 4 + 2.5 = 6.5
    // U = 6.5 - 2*3/2 = 3.5; AUC = 3.5 / (2*2) = 0.875
    val (p, n, u2, denom, a) = auc(Seq((1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L)))
    assert(p == 2L && n == 2L)
    assert(u2 == 7L && denom == 8L) // 2U = 7, 2PN = 8; 7/8 = 0.875
    assert(a == 0.875)
  }

  test("perfect separation is 1.0, anti-perfect is 0.0, random-interleave is 0.5") {
    assert(auc(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))._5 == 1.0)
    assert(auc(Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)))._5 == 0.0)
    // all scores tied: every pair is a half-win
    assert(auc(Seq((5L, 1L), (5L, 0L), (5L, 1L), (5L, 0L)))._5 == 0.5)
  }

  test("histogram formulation equals the row-rank definition on a larger random-ish set") {
    // deterministic pseudo-random labels/scores with heavy ties
    val rows = (1 to 200).map { i =>
      val s = (i * 2654435761L) % 13
      val pos = if ((i * 40503L) % 7 < 3) 1L else 0L
      (s, pos)
    }
    val (p, n, u2, denom, a) = auc(rows)
    // reference: direct pairwise count — wins + half-ties over P*N
    val posS = rows.filter(_._2 == 1L).map(_._1)
    val negS = rows.filter(_._2 == 0L).map(_._1)
    val wins = (for (x <- posS; y <- negS) yield if (x > y) 2L else if (x == y) 1L else 0L).sum
    assert(p == posS.size.toLong && n == negS.size.toLong)
    assert(u2 == wins, "2U must equal pairwise 2*(wins + ties/2)")
    assert(a == wins.toDouble / denom)
  }
}
