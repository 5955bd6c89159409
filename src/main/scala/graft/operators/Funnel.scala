package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered conversion funnels (ClickHouse `windowFunnel` semantics): for
  * an ordered list of step event types, a user reaches step i+1 when an
  * event of that type occurs within `window` of the FIRST qualifying
  * step-i event — greedy earliest-chain, per user.
  *
  * Scale shape (the reason this is NOT the textbook self-join chain): the
  * whole funnel is computed from ONE scan of the events relation,
  * filtered to the step types (pushed to the source) and projected to
  * (entity, ts, type), and ONE hash exchange on the entity — each step's
  * first-qualifying timestamp is a whole-partition window minimum nested
  * on the previous step's, and Spark stacks the window passes on the same
  * partitioning without re-shuffling. A join-chain formulation evaluates
  * the events source once PER STAGE (Spark does no cross-branch common
  * subexpression reuse), and a sorted per-user fold
  * (`collect_list` + sort) buffers unboundedly per entity. Asserted in
  * PlanCheck via the `a20_funnel` carrier: 1 scan, 1 hash exchange.
  */
object Funnel {

  /** Per-entity step timestamps: one row per entity with columns
    * `t1..tN` (timestamp of the first qualifying event of each step,
    * null from the first step the entity never reached).
    *
    * @param events relation with (entityCol, tsCol, typeCol)
    * @param steps  ordered event-type names, length ≥ 1
    * @param window max gap between consecutive step timestamps
    */
  def stepTimes(events: DataFrame, entityCol: String, tsCol: String,
                typeCol: String, steps: Seq[String], window: Column): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val w = Window.partitionBy(entityCol)
    val filtered = events
      .filter(col(typeCol).isin(steps.map(lit(_)): _*))
      .select(col(entityCol), col(tsCol), col(typeCol))
    val withSteps = steps.zipWithIndex.foldLeft(filtered) { case (df, (step, i)) =>
      val qualifies =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step &&
          col(tsCol) >= col(s"t$i") && col(tsCol) <= col(s"t$i") + window
      df.withColumn(s"t${i + 1}", min(when(qualifies, col(tsCol))).over(w))
    }
    withSteps
      .groupBy(entityCol) // same key as the window partitioning — no new exchange
      .agg(max(col("t1")).as("t1"),
        steps.indices.drop(1).map(i => max(col(s"t${i + 1}")).as(s"t${i + 1}")): _*)
  }

  /** Funnel summary: one row per step with `(stage, step, users)` —
    * how many entities reached it. Built on [[stepTimes]]; the per-step
    * rows come from exploding a literal array over the single global
    * count row, so nothing besides the 1-row aggregate leaves the plan.
    */
  def funnelCounts(events: DataFrame, entityCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String], window: Column): DataFrame = {
    val counts = stepTimes(events, entityCol, tsCol, typeCol, steps, window)
      .agg(count(col("t1")).as("u1"),
        steps.indices.drop(1).map(i => count(col(s"t${i + 1}")).as(s"u${i + 1}")): _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit((i + 1).toLong).as("stage"), lit(step).as("step"),
          col(s"u${i + 1}").as("users"))
      }: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.step").as("step"),
        col("r.users").as("users"))
      .orderBy("stage")
  }
}
