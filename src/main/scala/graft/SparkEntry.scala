package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query registry lives in [[Queries]] / [[QueriesExt]]; each entry is
  * one operator from SURVEY.md §2 (or a north-star extension) with a DuckDB
  * oracle where ANSI SQL can express it.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The one-pass per-entity summary with suspicious score + classification
    * — the Spark re-expression of the reference's 8-pass per-IP build
    * (stats_dashboard.py:103-144).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.entitySummary(Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose engine-specific hashes
    * ANSI SQL cannot replicate (those get rows-only checks + ScalaTest
    * invariants instead). */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
