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
}
