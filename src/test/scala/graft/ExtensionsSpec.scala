package graft

import graft.functions.{NativeExpressions, Similarity}
import org.apache.spark.sql.functions._

/** SparkSessionExtensions surface: the native kernels as SQL functions,
  * plus IVF ANN recall against brute force.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("graft_shingles and graft_minhash from SQL") {
    val r = spark.sql(
      "SELECT graft_shingles('a b c', 2) AS sh, size(graft_minhash(graft_shingles('a b c', 2), 16)) AS k").head()
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getInt(1) == 16)
  }

  test("graft_simhash and graft_lsh_buckets from SQL") {
    val r = spark.sql(
      "SELECT graft_simhash(split('x y z', ' ')) AS s, size(graft_lsh_buckets(array(cast(0.5 as float)), 4, 8)) AS t").head()
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) == 4)
  }

  test("RegexpCountRewrite: size(regexp_extract_all) rewritten to the kernel, same results") {
    // non-foldable input (derived from range's id) so neither constant
    // folding nor ConvertToLocalRelation erases the expression before the
    // injected rule batch runs
    val df = spark.range(4)
      .select(when(col("id") === 0, "a1 b22 c333!")
        .when(col("id") === 1, "")
        .when(col("id") === 2, "no digits here").as("s"))
      .select(col("s"), size(regexp_extract_all(col("s"), lit("\\d+"), lit(0))).as("n"))
    // rule fired: the optimized plan carries the kernel, not the array build
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_regexp_count") && !opt.toLowerCase.contains("regexp_extract_all"))
    // results identical to the un-rewritten semantics (null → null)
    val got = df.collect().map(r => if (r.isNullAt(1)) null else r.getInt(1)).toSeq
    assert(got == Seq(3, 0, 0, null))
    // SQL registration of the kernel itself
    assert(spark.sql("SELECT graft_regexp_count('x1y2', '\\\\d') AS n").head().getInt(0) == 2)
  }

  test("RegexpCountRewrite: group index != 0 is NOT rewritten (error semantics preserved)") {
    val df = spark.range(1)
      .select(concat(lit("ab"), (col("id") * 0).cast("string")).as("s"))
      .select(size(regexp_extract_all(col("s"), lit("(a)(b)"), lit(2))).as("n"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("graft_regexp_count"))
    assert(df.head().getInt(0) == 1)
  }

  test("graft_minhash rejects non-literal k") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), cast(rand() * 4 as int))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  // IVF vs brute force on deterministic vectors: nearest neighbor of a
  // near-identical pair must be recalled.
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(d => math.sin(seed * 7.3 + d * 1.7).toFloat)
  private val vectors = (0 until 40).map { i =>
    val base = if (i == 1) vec(0) else vec(i)
    val e = if (i == 1) base.updated(0, base(0) + 0.01f) else base
    (i.toLong, e, i % 2)
  }.toDF("vec_id", "embedding", "label")

  test("ivfTopK: near-identical vector recalled at rank 1 with enough probes") {
    val out = Similarity.ivfTopK(vectors, vectors.filter($"vec_id" === 0L),
      k = 3, nCentroids = 8, nProbe = 8) // probe all cells == exact
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.head == (1L, 1))
    // probing ALL cells must equal brute force exactly
    val brute = Similarity.bruteForceTopK(vectors, vectors.filter($"vec_id" === 0L), k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == brute.toSeq)
  }

  test("NearestCentroids assigns identical vectors to the same cell") {
    val cents = Array(vec(0), vec(5), vec(9))
    val df = Seq(vec(5), vec(5)).toDF("e")
    val cells = df.select(element_at(
      NativeExpressions.nearestCentroids($"e", cents, 1), 1)).collect().map(_.getInt(0))
    assert(cells(0) == cells(1) && cells(0) == 1)
  }
}
