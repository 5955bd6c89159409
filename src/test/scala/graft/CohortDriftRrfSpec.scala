package graft

/** Semantic invariants for the round-8 analytics additions — the registry
  * oracles prove each query hash-exact vs DuckDB; these prove the SHAPES
  * behave like the statistics they claim to be.
  */
class CohortDriftRrfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a22_cohort_retention: week-0 retention is 1.0 and offsets are monotone-bounded") {
    val rows = SparkEntry.queries("a22_cohort_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.foreach { case (_, cells) =>
      val week0 = cells.filter(_.getLong(1) == 0L)
      assert(week0.length == 1, "every cohort has exactly one week-0 cell")
      assert(week0.head.getDouble(3) == 1.0, "week-0 retention is the cohort itself")
      val size0 = week0.head.getLong(2)
      cells.foreach { c =>
        assert(c.getLong(1) >= 0, "offsets are non-negative")
        assert(c.getLong(2) <= size0, "no later week exceeds the cohort size")
        assert(c.getDouble(3) > 0.0 && c.getDouble(3) <= 1.0)
      }
    }
    // cohorts are Mondays (ISO week truncation)
    rows.foreach { r =>
      assert(r.getDate(0).toLocalDate.getDayOfWeek == java.time.DayOfWeek.MONDAY)
    }
  }

  test("a23_psi_drift: identical distributions give zero PSI; shares are smoothed and positive") {
    val rows = SparkEntry.queries("a23_psi_drift")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val total = rows.head.getDouble(6)
    rows.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 9)
      assert(r.getDouble(3) > 0.0 && r.getDouble(4) > 0.0, "Laplace smoothing keeps shares positive")
      assert(r.getDouble(6) == total, "psi_total is one global value on every row")
    }
    // integer-floored contributions sum exactly to the reported total
    val sumContrib = rows.map(r => math.round(r.getDouble(5) * 10000)).sum
    assert(math.round(total * 10000) == sumContrib)
    // PSI of the synthetic drift between month-halves stays small but defined
    assert(total > -10 && total < 10)
  }

  test("ir_rrf_fusion: fused ranks are dense from 1 and ordered by rrf score; both systems contribute") {
    val rows = SparkEntry.queries("ir_rrf_fusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(1L, 2L, 3L))
    byQuery.foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq, "fused ranks dense from 1")
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "rrf descending")
      rs.foreach { r =>
        val lex = if (r.isNullAt(3)) None else Some(r.getLong(3))
        val den = if (r.isNullAt(4)) None else Some(r.getLong(4))
        assert(lex.isDefined || den.isDefined, "every fused doc came from some system")
        val expected =
          lex.map(x => 1.0 / (x + 60).toDouble).getOrElse(0.0) +
            den.map(x => 1.0 / (x + 60).toDouble).getOrElse(0.0)
        assert(r.getDouble(5) == expected, "rrf score is exactly the rank-reciprocal sum")
      }
    }
    // a doc ranked by BOTH systems must outscore one ranked identically by one
    val bothMax = rows.filter(r => !r.isNullAt(3) && !r.isNullAt(4)).map(_.getDouble(5))
    val oneMin = 1.0 / 61.0 + 1.0 / 70.0
    bothMax.foreach(s => assert(s > 1.0 / 70.0, "dual-system docs beat the single-system floor"))
    assert(oneMin > 0) // bound used above stays meaningful
  }

  test("ir_ndcg_eval: metrics are bounded and consistent with each other") {
    val rows = SparkEntry.queries("ir_ndcg_eval")(spark, sf).collect()
    assert(rows.length == 10, "one row per query (vec_id < 10)")
    rows.foreach { r =>
      val (mrr, dcg, idcg, ndcg) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, "nDCG bounded by the ideal ranking")
      assert(dcg <= idcg + 1e-9)
      if (!r.isNullAt(2)) {
        val first = r.getAs[Number](2).longValue()
        assert(mrr == 1.0 / first)
        assert(dcg > 0.0 && ndcg > 0.0)
      } else assert(mrr == 0.0 && dcg == 0.0)
      assert(r.getLong(1) > 0, "every query label has other members")
    }
  }

  test("ir_prf_expansion: expanded ranking stays well-formed and keeps feedback docs rankable") {
    val prf = SparkEntry.queries("ir_prf_expansion")(spark, sf).collect()
    val base = SparkEntry.queries("ir_bm25")(spark, sf).collect()
    assert(prf.map(_.getLong(0)).toSet == base.map(_.getLong(0)).toSet, "same query workload")
    prf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length), "ranks dense from 1")
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores non-increasing")
      assert(rs.forall(_.getDouble(3) > 0.0))
    }
    // expansion only ADDS terms, so every doc keeps its base contribution:
    // a query's expanded candidate set must be a superset of its base top
    // docs' presence — check sizes don't shrink
    prf.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val baseN = base.count(_.getLong(0) == q)
      assert(rs.length >= math.min(baseN, 10) || rs.length == 10)
    }
  }

  test("a24_markov_transitions: rows are probability distributions over observed next states") {
    val rows = SparkEntry.queries("a24_markov_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getString(0)).toSet ++ rows.map(_.getString(1)).toSet
    assert(rows.length <= types.size * types.size)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getString(1)).distinct.length == rs.length, "one row per (prev, next)")
      rs.foreach(r => assert(r.getLong(2) > 0 && r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-3, s"row distribution sums to ~1 (got $psum)")
    }
  }

  test("a25_zscore_anomaly: every flagged event is a genuine 3-sigma outlier of its own history") {
    val rows = SparkEntry.queries("a25_zscore_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(4)
      assert(n >= 10 && n <= 20, "warmup and frame bounds respected")
      assert(math.abs(r.getDouble(5)) > 3.0, "reported z exceeds the threshold")
    }
    // cross-check one flagged row against a direct recomputation
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val flagged = rows.head
    val (uid, eid) = (flagged.getLong(1), flagged.getLong(0))
    val hist = ev.filter(_._1 == uid).sortBy(e => (e._2.getTime, e._3))
    val idx = hist.indexWhere(_._3 == eid)
    val trail = hist.slice(math.max(0, idx - 20), idx).map(e => math.round(e._4 * 100))
    val (s1, s2, n) = (trail.sum, trail.map(x => x * x).sum, trail.length.toLong)
    val vc = math.round(hist(idx)._4 * 100)
    val z = (vc * n - s1).toDouble / math.sqrt((n * s2 - s1 * s1).toDouble)
    assert(math.abs(z - flagged.getDouble(5)) < 1e-9, "z matches the direct recomputation")
  }

  test("tx_dsir_weights: target-domain (en) documents score higher than off-target ones") {
    val rows = SparkEntry.queries("tx_dsir_weights")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size, "every document gets a weight")
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "token counts positive")
      assert(r.getDouble(2) / r.getLong(1) == r.getDouble(3) ||
        math.abs(r.getDouble(2) / r.getLong(1) - r.getDouble(3)) < 1e-12)
    }
    val (en, other) = rows.partition(r => docs(r.getLong(0)) == "en")
    assert(en.nonEmpty && other.nonEmpty, "corpus has both en and non-en docs")
    def mean(xs: Array[Double]) = xs.sum / xs.length
    val enMean = mean(en.map(_.getDouble(3)))
    val otherMean = mean(other.map(_.getDouble(3)))
    assert(enMean > otherMean,
      s"importance weighting prefers the target domain (en $enMean vs other $otherMean)")
  }
}
