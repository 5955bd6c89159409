package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet; Catalyst gets full predicate pushdown and
  * column pruning on them. At cluster scale the same API would point at a
  * partitioned table root instead of a single file — the query code does not
  * change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as two different physical types across driver
    * testdata generations: INT64 TIMESTAMP(NANOS) (rounds 1-6) and
    * TIMESTAMP_MICROS / NTZ (round 7+). We keep both paths live and branch
    * on the type Spark actually loaded, so a future regeneration flipping
    * back does not break the suite again:
    *
    *   - LongType (via `nanosAsLong=true`, which Spark 4 needs because
    *     nanosecond timestamps exceed TimestampType's µs precision):
    *     truncate ns → µs, exactly what DuckDB's `cast(ts as timestamp)`
    *     does on the oracle side, so both engines see identical instants.
    *   - TimestampNTZType: cast to session-local TimestampType. The session
    *     timezone is UTC (GraftSession), so NTZ → LTZ is an identity on the
    *     underlying instant and matches DuckDB's naive-timestamp read.
    *   - TimestampType: already what we want; pass through.
    */
  /** `events.value` CONTRACT: finite or NULL, never NaN. Every ingest
    * path in this engine already satisfies it (the log parsers emit NULL
    * for an unparseable metric, never NaN), and the driver's generator
    * has never shipped NaN. The contract is deliberate, not an oversight:
    * normalizing here (`when(!isnan(value), value)`) would put a computed
    * projection over every events scan and forfeit parquet pushdown of
    * value predicates (PlanCheck pins `PushedFilters: [IsNotNull(value),
    * GreaterThan(value,150.0)]` on s1), while a NaN would ALSO error ~14
    * DuckDB oracles at `cast(value as decimal)` — measured with the
    * degenerate-corpus gate, round 10. A pipeline ingesting external
    * doubles must normalize NaN at ITS writer, where the row is already
    * being materialized anyway.
    *
    * The same writer contract covers SIGNED ZERO (r16, fuzz find):
    * `value` is never -0.0. Spark normalizes -0.0 to +0.0 the moment a
    * double becomes a grouping/join/window key (NormalizeFloatingNumbers)
    * while DuckDB groups them as equal but emits whichever representative
    * it saw first — so a -0.0 reaching a value-keyed aggregate (the w5/w7
    * value histogram) prints differently per engine with identical
    * semantics. The engine already canonicalizes zeros at its other
    * boundary (docstore canonKey / cmpValues / Bloom.hashPair); external
    * writers normalize at ingest for the same reason.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral div: ns → µs. `div` truncates toward ZERO — deliberately
        // NOT floor division (TimeUs's convention): the governing contract
        // here is ORACLE parity, and DuckDB's ns→µs cast measured
        // -1500 ns → -1 µs (trunc), not -2 (floor). Testdata is post-epoch
        // so the branch is dormant; if pre-epoch nanos ever ship, this and
        // the oracle must stay trunc together.
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
}
