package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics at corpus scale.
  *
  * The classifier family (tx_classify / tx_train_lr) produces scores; this
  * is the matching EVALUATION step of a training-data pipeline — measured
  * on the corpus, not a sampled eval set, so the metric itself has to be a
  * distributed aggregate.
  */
object Eval {

  /** Exact ROC-AUC by rank-sum (Mann-Whitney U) with average-rank tie
    * handling, over an INTEGER score column.
    *
    * Scale design: AUC needs a global ranking, but ranking ROWS would be a
    * single-task sort of the corpus. Integer scores make the exact metric
    * computable from the per-SCORE histogram instead:
    *
    *   1. one partial-aggregated shuffle to (score → positives, total) —
    *      at most #distinct-scores rows leave the map side;
    *   2. a cumulative window + final aggregate over that HISTOGRAM
    *      (thousands of rows at any corpus size — the single-partition
    *      window is over the histogram, never the corpus).
    *
    * All arithmetic stays integral until one final long/long division
    * (IEEE-exact in any engine): with positives at score s getting average
    * rank cb + (n_s+1)/2 (cb = count strictly below s),
    * 2·R⁺ = Σ np_s·(2·cb + n_s + 1), U·2 = 2·R⁺ − P(P+1), and
    * AUC = 2U / (2·P·N). Returns one row:
    * (p, neg, u2 = 2U, denom = 2PN, auc = u2/denom).
    */
  def aucExact(df: DataFrame, score: Column, label: Column): DataFrame = {
    val byScore = df.select(score.cast("long").as("s"), label.cast("long").as("pos"))
      .groupBy("s").agg(sum("pos").as("np"), count(lit(1)).as("ns"))
    val below = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    byScore.withColumn("cb", coalesce(sum("ns").over(below), lit(0L)))
      .agg(
        sum(col("np") * (lit(2L) * col("cb") + col("ns") + lit(1L))).as("r2"),
        sum("np").as("p"),
        sum("ns").as("n_tot"))
      .select(
        col("p"),
        (col("n_tot") - col("p")).as("neg"),
        (col("r2") - col("p") * (col("p") + lit(1L))).as("u2"),
        (lit(2L) * col("p") * (col("n_tot") - col("p"))).as("denom"))
      // single-class input (p=0 or neg=0): AUC is undefined — null, not
      // the Infinity/NaN an unguarded 0-denominator division produces
      .withColumn("auc",
        when(col("denom") > 0L, col("u2").cast("double") / col("denom")))
  }
}
