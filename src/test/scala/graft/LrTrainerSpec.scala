package graft

import org.apache.spark.sql.functions._

/** The two claims tx_train_lr rests on:
  *   1. the integer-quantized gradient sum is partitioning-proof — the
  *      floor-before-sum device removes float-reduction order sensitivity,
  *      so ANY repartitioning yields bit-identical gradients (this is what
  *      a plain sum(double) cannot promise);
  *   2. the training loop actually learns: gradient magnitude shrinks
  *      monotonically over the 5 iterations on real data.
  */
class LrTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("integer-quantized gradient is identical under any partitioning") {
    val rnd = new scala.util.Random(7)
    val feat = Seq.fill(500)((rnd.nextDouble(), rnd.nextDouble(), if (rnd.nextBoolean()) 1.0 else 0.0))
      .toDF("f1", "f2", "y")
    val w = Array(0.3, -0.2, 0.1)
    def gradients(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val z = (lit(w(0)) * lit(1.0) + lit(w(1)) * col("f1")) + lit(w(2)) * col("f2")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val r = df.select(p.as("p"), col("y"), col("f1"), col("f2"))
        .agg(sum(floor((col("p") - col("y")) * lit(1048576.0))).as("g0"),
          sum(floor(((col("p") - col("y")) * col("f1")) * lit(1048576.0))).as("g1"),
          sum(floor(((col("p") - col("y")) * col("f2")) * lit(1048576.0))).as("g2"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val base = gradients(feat.repartition(1))
    assert(gradients(feat.repartition(7)) == base)
    assert(gradients(feat.repartition(32)) == base)
    // and it matches a local sequential reference exactly
    val local = feat.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val ref = local.foldLeft((0L, 0L, 0L)) { case ((a, b, c), (f1, f2, y)) =>
      val z = (w(0) * 1.0 + w(1) * f1) + w(2) * f2
      val p = 1.0 / (1.0 + math.exp(-z))
      (a + math.floor((p - y) * 1048576.0).toLong,
        b + math.floor(((p - y) * f1) * 1048576.0).toLong,
        c + math.floor(((p - y) * f2) * 1048576.0).toLong)
    }
    assert(base == ref)
  }

  test("gradient magnitude shrinks monotonically over the training run") {
    val out = SparkEntry.queries("tx_train_lr")(spark, "/root/testdata/sf0.001")
      .orderBy("iter").collect()
    assert(out.length == 5)
    val gNorms = out.map(r => math.abs(r.getLong(5)) + math.abs(r.getLong(6))
      + math.abs(r.getLong(7)) + math.abs(r.getLong(8)))
    gNorms.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"gradient norm did not shrink: ${gNorms.mkString(", ")}")
    }
  }
}
