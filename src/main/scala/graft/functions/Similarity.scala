package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design:
  *   - dot/cosine are higher-order-function folds over the array — codegen'd,
  *     no UDF, computed where the data lives.
  *   - brute-force top-k is a broadcast of the (small) query set against the
  *     full corpus — one map-side pass + a per-query TakeOrdered; the corpus
  *     is never shuffled.
  *   - the LSH variant buckets vectors by random-hyperplane sign bits so the
  *     candidate join is bucket-equality (shuffle O(n·tables), not all-pairs).
  *     Hyperplane coefficients are derived deterministically from (table,
  *     bit, dim) hashes — reproducible across runs and engines, no RNG state.
  */
object Similarity {

  /** Sequential-fold dot product in double precision (floats widen exactly,
    * fold order is left-to-right — bit-reproducible across engines).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k: for each query vector (small set, broadcast),
    * rank the full corpus. Returns (query_id, neighbor_id, cos, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane coefficient in [-1, 1] for
    * (table, bit, dim) — a hash folded to a unit-interval double.
    */
  private def coeff(table: Int, bit: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table), lit(bit), dim), lit(2000001L)) - 1000000L) / 1000000.0

  /** Random-hyperplane LSH bucket key: `bits` sign bits per table. */
  def lshBucket(vec: Column, table: Int, bits: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val bitCols = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, dims, (v, d) => v.cast("double") * coeff(table, b, d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate nearest neighbors: candidates are corpus
    * vectors sharing any table bucket with the query, then exact cosine +
    * top-k within candidates. Recall grows with `tables`, cost with
    * bucket occupancy (2^bits buckets per table).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 4, bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def withBuckets(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("t"), lshBucket(col("embedding"), t, bits).as("bk"))
        }: _*)).as("bucket"))

    val qb = withBuckets(queries, "query_id", "qe")
    val cb = withBuckets(corpus, "neighbor_id", "ne")

    val cands = qb.join(cb, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qe", "neighbor_id", "ne")
      .distinct()
      .withColumn("cos", cosine(col("qe"), col("ne")))

    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key (e.g.
    * label): pairs with cosine ≥ threshold, id_a < id_b.
    */
  def nearDupPairs(vectors: DataFrame, blockCol: String, threshold: Double): DataFrame =
    vectors.as("a").join(vectors.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
}
