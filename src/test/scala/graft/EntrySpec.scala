package graft

/** Driver-contract smoke: `SparkEntry.entry` must work on a session the
  * DRIVER builds (no graft configs), and return rows at sf0.001.
  */
class EntrySpec extends SparkSpec {
  test("entry returns rows on a plain session (driver smoke parity)") {
    // TestSpark's session stands in for the driver's; Tables.events sets
    // the nanos conf at runtime, so entry must not depend on builder confs.
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("suspicious_score"))
  }

  test("queries and oracleSql keys are consistent") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without queries: ${o.diff(q)}")
    val noOracle = q.diff(o)
    // EVERY query is oracle-checked since r11 (dd_minhash_lsh / dd_simhash
    // graduated round 9; sim_ann_lsh round 10 via the algorithm-replay
    // oracle; a18/a19 round 11 via bounded-property verdict outputs whose
    // oracles replay the exact side and pin the in-bound flags TRUE)
    assert(noOracle.isEmpty, s"queries without oracles: $noOracle")
  }
}
