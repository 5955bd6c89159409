package graft

import graft.operators.SkewJoins
import org.apache.spark.sql.functions._

class SkewJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def big = (1L to 1000L).map(i => (i, if (i % 10 == 0) "cold" else "hot", i * 2))
    .toDF("id", "k", "v")
  private def dim = Seq(("hot", 1.0), ("cold", 2.0), ("absent", 3.0)).toDF("k", "w")

  test("salted join result equals the plain join") {
    val plain = big.join(dim, "k").select("id", "k", "v", "w")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoins.saltedJoin(big, dim, "k", buckets = 8, xxhash64($"id"))
      .select("id", "k", "v", "w")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000) // inner join drops nothing on matched keys
  }

  test("exploded small side sits behind a stage boundary (blind-broadcast guard)") {
    // the static planner costs the exploded side at its slim PRE-explode
    // estimate and could broadcast buckets× the data; the repartition
    // boundary makes AQE size the RUNTIME rows instead
    val out = SkewJoins.saltedJoin(big, dim, "k", buckets = 8, xxhash64($"id"))
    val boundaries = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
    }
    assert(boundaries.nonEmpty)
  }

  test("salt actually spreads a hot key over multiple buckets") {
    val salted = big.withColumn("_salt", pmod(xxhash64($"id"), lit(8L)).cast("int"))
    val hotBuckets = salted.filter($"k" === "hot")
      .select("_salt").distinct().count()
    assert(hotBuckets == 8) // 900 hot rows land in all 8 salt buckets
  }
}
