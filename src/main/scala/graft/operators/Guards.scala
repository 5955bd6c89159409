package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared fail-fast guards for operators that stage working columns on a
  * caller's frame. `withColumn` silently REPLACES an existing column of
  * the same name, and the operator's trailing `drop` then deletes the
  * caller's data with no error — the guard turns that silent loss into a
  * loud, actionable require. (Operators whose working-column names are
  * baked into expression strings cannot take the SkewJoins generated-name
  * route, so the require IS the contract.)
  */
private[graft] object Guards {

  def requireNoCollision(df: DataFrame, side: String, reserved: Seq[String]): Unit = {
    val hit = df.columns.toSet.intersect(reserved.toSet)
    require(hit.isEmpty,
      s"$side input already has column(s) ${hit.mkString(", ")} — " +
        "reserved by the operator (rename them before the call)")
  }
}
