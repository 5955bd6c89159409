package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Shared fail-fast guards and stage plumbing for operators that stage
  * working columns on a caller's frame or join over un-materialized
  * explodes.
  */
private[graft] object Guards {

  /** Fail fast when an input frame already carries one of an operator's
    * working/output column names: `withColumn` silently REPLACES an
    * existing column — and it resolves CASE-INSENSITIVELY under Spark's
    * default, so the check must too, or a caller's `_H` still vanishes
    * when the operator stages `_h`. (Operators whose working-column names
    * are baked into expression strings cannot take the SkewJoins
    * generated-name route, so the require IS the contract.)
    */
  def requireNoCollision(df: DataFrame, side: String, reserved: Seq[String]): Unit = {
    val res = reserved.map(_.toLowerCase).toSet
    val hit = df.columns.filter(c => res.contains(c.toLowerCase))
    require(hit.isEmpty,
      s"$side input already has column(s) ${hit.mkString(", ")} — " +
        "reserved by the operator (rename them before the call)")
  }

  /** Stage-bound a join input whose rows the static planner cannot size
    * (an un-materialized explode: the estimate is the slim PRE-explode
    * projection, so the planner can blind-broadcast many times the real
    * data — the measured round-9 defect class, see Dedup.bucketSelfJoin).
    * AQE on: a repartition on the join keys inserts the stage boundary
    * that makes the planner size the RUNTIME rows — broadcast only when
    * the side truly is small, and the exchange is reused if sort-merge is
    * picked. AQE off: the boundary cannot inform the static planner, so
    * pin sort-merge outright. ONE definition so a future planner/conf
    * change lands everywhere at once.
    */
  def stageBound(df: DataFrame, keys: Column*): DataFrame = {
    val aqe = df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true")
      .equalsIgnoreCase("true")
    if (aqe) df.repartition(keys: _*) else df.hint("merge")
  }

  /** Round-robin-spread a NARROW scan across the cluster before an
    * expensive per-row kernel (shingle tokenization, signature hashing) or
    * a cache whose consumers re-scan it. A single small input file arrives
    * as ONE split, so the kernel, the cache build, and every cache reader
    * would otherwise run on one core — the optimization guide §2.5
    * unsplittable-input case ("repartition immediately after the read"),
    * measured here as 0.6-1.1 s single-task tokenize stages at sf0.1.
    *
    * Scale-adaptive, never a local-mode constant: an input already
    * carrying at least the session's default parallelism is returned
    * UNTOUCHED — at 100 TB a corpus scan has thousands of splits and this
    * is an identity. Only a below-cluster-width scan (one small file, a
    * bounded delta batch) pays the exchange, and the exchange is of the
    * slim pre-kernel projection (callers project first — guide §2.3).
    * The spread is ROUND-ROBIN, not keyed: PlanCheck's "no shuffle
    * carries document text" gates pin HASH exchanges, the shape that
    * would move the corpus by key at scale; this one disappears there.
    * Determinism under retries: round-robin repartition sorts its input
    * before exchanging (spark.sql.execution.sortBeforeRepartition, on by
    * default since SPARK-23207), so re-run tasks reproduce the same
    * row placement.
    */
  def spread(df: DataFrame): DataFrame = {
    // SCAN-ROOTED plans only (r18 review find): the partition probe
    // below (`df.rdd`) MATERIALIZES upstream query stages under AQE —
    // Dataset.rdd resolves the adaptive plan, which executes every
    // shuffle in it. A plan that is just projections/filters over a leaf
    // has no stages to run, so its probe is free — and those are exactly
    // the plans a one-split scan can under-parallelize. Anything deeper
    // (joins, aggregates, windows) got or will get its parallelism from
    // its own exchanges; return it untouched rather than execute it
    // twice. Callers that want a complex input spread must spread the
    // scan-rooted side BEFORE composing (see pipe_clean_corpus).
    def scanRooted(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
        case n @ (_: org.apache.spark.sql.catalyst.plans.logical.Project |
                  _: org.apache.spark.sql.catalyst.plans.logical.Filter |
                  _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias) =>
          n.children.forall(scanRooted)
        case _ => false
      }
    if (!scanRooted(df.queryExecution.analyzed)) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }
}
