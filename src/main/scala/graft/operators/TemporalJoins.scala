package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins (as-of join, range
  * join), composed from sort/window/bin-join primitives so they scale —
  * the preference-order "(a) compose existing ops" path; no custom
  * physical operator is needed for these semantics.
  *
  * Scale design:
  *   - asOfJoin: union the two sides and take ONE shuffle+sort per key
  *     (the sort-merge formulation of as-of). No per-row range probe, no
  *     state blowup; skewed keys are handled by AQE like any sort.
  *   - rangeJoinCount: bucketize time so the join is EQUI on (key, bin) —
  *     a window of length W only ever spans two W-sized bins, so each
  *     probe row expands to exactly 2 candidate bins, bounding the join
  *     fan-out at 2× regardless of data (the standard binned range-join
  *     rewrite; Spark would otherwise plan a nested-loop).
  */
object TemporalJoins {

  /** Fail fast on working/output-column collisions — [[Guards]], shared
    * with the streaming entry points that stage columns the same way.
    */
  private def requireNoCollision(df: DataFrame, side: String, reserved: Seq[String]): Unit =
    Guards.requireNoCollision(df, s"TemporalJoins: $side", reserved)

  /** For each left row, the most recent right row with rts <= lts, per key
    * (left as-of-backward join). Tie semantics: a right row at exactly
    * lts is visible; among right rows sharing rts the one with the
    * greatest `rightOrd` wins. Output: left columns + struct of the
    * matched right row (null if none).
    *
    * Implementation: tag and union both sides, then one
    * last(ignoreNulls) over (key ORDER BY ts, isRight DESC, ord) — the
    * sort interleaves right rows before left rows at equal ts, so the
    * running "last right row" is exactly the as-of match.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String, rightOrd: String,
               rightPayload: Seq[String]): DataFrame = {
    requireNoCollision(left, "left", Seq("__is_r", "__ts", "__ord", "__rrow", "__asof", "asof"))
    // Typed null literal built from the actual schema, not a DDL string —
    // string-concatenated DDL breaks on any column name that is not a
    // bare identifier (spaces, dots, colons), while the struct() call on
    // the tagged side handles them fine.
    val rrowType = org.apache.spark.sql.types.StructType(
      (Seq(rightTs, rightOrd) ++ rightPayload).map(c =>
        org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lTagged = left.withColumn("__is_r", lit(false))
      .withColumn("__ts", col(leftTs))
      .withColumn("__ord", lit(Long.MaxValue))
      .withColumn("__rrow", lit(null).cast(rrowType))
    // A right row with a NULL timestamp is "as of" nothing: ascending
    // sorts place NULL first, so without the filter a null-rts row would
    // become the running match for every left row that precedes all real
    // right rows — violating the rts <= lts contract.
    val rTagged = right.filter(col(rightTs).isNotNull).select(
      col(keyCol), lit(true).as("__is_r"), col(rightTs).as("__ts"),
      col(rightOrd).cast("long").as("__ord"),
      struct((Seq(rightTs, rightOrd) ++ rightPayload).map(col): _*).as("__rrow"))

    val unioned = lTagged.select((col(keyCol) +: lTagged.columns.filter(_ != keyCol).map(col).toSeq): _*)
      .unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts"), desc("__is_r"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__asof", last(when(col("__is_r"), col("__rrow")), ignoreNulls = true).over(w))
      .filter(!col("__is_r"))
      .drop("__is_r", "__ts", "__ord", "__rrow")
      .withColumnRenamed("__asof", "asof")
  }

  /** For each probe row: the COUNT of build rows with the same key whose
    * ts lies in [probeTs - windowMicros, probeTs). Equi-join on
    * (key, time-bin) with exactly 2 candidate bins per build row, exact
    * range filter after. Probe rows with no matches get 0 (left
    * semantics).
    */
  def rangeJoinCount(probe: DataFrame, build: DataFrame, keyCol: String,
                     probeTs: String, buildTs: String, probeId: String,
                     windowMicros: Long): DataFrame = {
    // zero would die later with a bare ANSI DIVIDE_BY_ZERO from the bin
    // `div`; NEGATIVE is worse — the range predicate becomes a
    // contradiction and every probe row silently counts 0
    require(windowMicros > 0,
      s"rangeJoinCount: windowMicros must be positive, got $windowMicros")
    // __bus/__bkey are staged on the BUILD side, but a probe frame
    // carrying them would make the join predicate's unqualified
    // col("__bus") ambiguous — reserve them on the probe too
    requireNoCollision(probe, "probe",
      Seq("__pus", "__bin", "__cnt", "window_count", "__bus", "__bkey"))
    // bin off the aliased __pus (as the build side does off __bus) — an
    // expr() interpolating the raw probeTs name breaks on non-bare
    // identifiers and re-evaluates unix_micros for nothing
    val p = probe.withColumn("__pus", unix_micros(col(probeTs)))
      .withColumn("__bin", expr(s"__pus div ${windowMicros}L"))
    val bRows = build.select(col(keyCol).as("__bkey"), unix_micros(col(buildTs)).as("__bus"))
      // a build row at bin h can only match probes in bins h and h+1
      .withColumn("__bin", explode(array(
        expr(s"__bus div ${windowMicros}L"), expr(s"__bus div ${windowMicros}L + 1L"))))
    // Stage-bound the exploded side before the join: the planner's static
    // estimate is the slim PRE-explode projection, so a build side sized
    // just under the broadcast threshold would physically broadcast 2×
    // that — the round-9 blind-broadcast class ([[Guards.stageBound]]).
    val b = Guards.stageBound(bRows, col("__bkey"), col("__bin"))

    val matched = p
      .join(b, p(keyCol) === b("__bkey") && p("__bin") === b("__bin") &&
        col("__bus") >= col("__pus") - windowMicros && col("__bus") < col("__pus"))
      .groupBy(col(probeId)).agg(count(lit(1)).as("__cnt"))

    p.drop("__pus", "__bin")
      .join(matched, Seq(probeId), "left")
      .withColumn("window_count", coalesce(col("__cnt"), lit(0L)))
      .drop("__cnt")
  }
}
