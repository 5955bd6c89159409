package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered conversion funnels, gap-window greedy semantics: for an
  * ordered list of step event types, a user reaches step i+1 when an
  * event of that type occurs within `window` of the FIRST qualifying
  * step-i event — greedy earliest-chain, per user, with the window
  * re-anchored at EVERY step (each gap must fit in `window`).
  *
  * These are bespoke semantics, NOT ClickHouse-windowFunnel parity:
  * windowFunnel bounds the WHOLE chain within `window` of the chain
  * start and slides over later step-1 events when an earlier anchor
  * fails (view@0, view@3h, click@4h with window 1h: windowFunnel
  * reports level 2 off the second view; this operator anchors the first
  * view greedily and reports level 1). The greedy-anchor + per-gap
  * window pair is what the single-exchange nested-window-minimum plan
  * below can express exactly — and it is a defensible funnel definition
  * in its own right (each step must follow the previous "promptly") —
  * but a user porting ClickHouse funnels must re-derive expectations.
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
    // A NULL entity is excluded by contract (r14 fuzz find): a funnel
    // tracks ONE entity's journey, and grouping all unattributed events
    // into a single null pseudo-entity fabricates journeys from unrelated
    // rows (Spark's null groupBy-group "completed" steps the oracle's
    // null-unsafe join chain never credited — both readings of an
    // ill-posed question). Unattributed events are upstream's problem.
    val filtered = events
      .filter(col(entityCol).isNotNull)
      .filter(col(typeCol).isin(steps.map(lit(_)): _*))
      .select(col(entityCol), col(tsCol), col(typeCol))
    val withSteps = steps.zipWithIndex.foldLeft(filtered) { case (df, (step, i)) =>
      // consecutive IDENTICAL step types need a STRICT lower bound: with
      // >=, the single event that anchored step i would also satisfy step
      // i+1 (one page_view "completing" view→view) — a chain consumes one
      // event per position. The strict bound assumes distinct events
      // carry distinct timestamps (µs precision here); distinct-type
      // steps keep >= so a same-instant view→click→purchase still
      // completes. Known limits at EXACT-tie timestamps (accepted; the
      // fix for tie-prone sources is threading a (ts, event_id) pair
      // through t_i and bounding on the pair): (a) two SAME-type events
      // of one entity sharing a µs cannot complete a view→view chain here
      // though the streaming fold — which consumes events, not
      // timestamps — would; (b) a step type REPEATED non-adjacently
      // ([view, click, view]) can re-use the step-1 event for step 3 when
      // view and click share a µs, because only adjacency triggers the
      // strict bound.
      val qualifies =
        if (i == 0) col(typeCol) === step
        else {
          val lower =
            if (step == steps(i - 1)) col(tsCol) > col(s"t$i")
            else col(tsCol) >= col(s"t$i")
          col(typeCol) === step && lower && col(tsCol) <= col(s"t$i") + window
        }
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

  /** Per-user funnel progress: timestamps of the steps reached so far.
    * State is AT MOST `steps.length` longs per active user — constant,
    * independent of event volume. `done` marks an emitted conversion so a
    * user converts at most once (matching the batch single-chain
    * semantics). */
  case class FunnelState(times: List[Long], done: Boolean)

  /** One emitted conversion: the user and each step's timestamp. */
  case class ConversionOut(key: Long, step_times: Seq[java.sql.Timestamp])

  /** Streaming funnel — emits a row the moment a user completes the LAST
    * step, with all step timestamps. The streaming lift of [[stepTimes]],
    * with the divergences from the batch single-chain semantics stated
    * rather than hidden (both are consequences of BOUNDED state — the
    * alternative is keeping every user's record forever):
    *   - in-order exactness holds for chains that complete within the
    *     watermark horizon: each micro-batch folds in event-time order,
    *     and a cross-batch late event older than already-made progress
    *     cannot retract it;
    *   - state expiry re-anchors: once a chain's `last_step + window` has
    *     passed — by the watermark (EventTimeTimeout, fires when the user
    *     goes idle a batch) or by a newer event's own time (inline check
    *     in the fold, so an always-active user expires too and output
    *     never depends on micro-batch slicing) — the state is dropped and
    *     a LATER view starts a fresh chain, where batch, which sees all
    *     time at once, stays anchored on the first view forever;
    *   - conversions are at-most-once per funnel window: a converted
    *     user's tombstone lives until the watermark passes
    *     `conversion + window`, after which the user may legitimately
    *     convert again (batch reports only the first chain).
    *
    * Scale/state story: per-user state is ≤ N step timestamps (a few
    * dozen bytes) — NOT buffered events; `EventTimeTimeout` bounds total
    * state at active-in-window users × one tiny record, regardless of
    * stream length.
    */
  /* The primitive-Long key means a caller converting a nullable
   * DataFrame must drop null entities BEFORE the .as[] boundary — the
   * encoder would fold them into key 0 (the heavyHitterStream catch),
   * and the batch twin excludes null entities by contract (stepTimes). */
  def conversionStream(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp, String)],
                       steps: Seq[String], windowMillis: Long,
                       watermarkDelay: String = "1 hour"):
      org.apache.spark.sql.Dataset[ConversionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "at least one funnel step")
    // FIRST occurrence index per type: zipWithIndex.toMap keeps the LAST
    // index for a step type repeated at multiple positions, which would
    // order same-timestamp ties of an early-step type AFTER later steps
    // and stall the fold; first-occurrence restores batch parity for
    // repeated-type funnels
    val stepIdx = steps.zipWithIndex.reverse.toMap
    events
      .withWatermark("_2", watermarkDelay) // no-op on batch inputs
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp, String)],
         state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) {
            // Incomplete chain past its window (or a conversion tombstone):
            // no future event can change the outcome — drop the state.
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(Nil, done = false))
            val out = scala.collection.mutable.ListBuffer.empty[ConversionOut]
            // Fold in event-time order; ties ordered by step position so a
            // same-timestamp view→click→purchase completes like the batch
            // operator's >= boundary.
            // fold at exact MICROSECONDS — graft.TimeUs, the shared µs
            // conversion (getTime truncates to ms) — ties by step position
            def us(t: java.sql.Timestamp): Long = graft.TimeUs.toUs(t)
            def tsOf(u: Long): java.sql.Timestamp = graft.TimeUs.toTs(u)
            rows.toSeq.filter(r => stepIdx.contains(r._3))
              .sortBy(r => (us(r._2), stepIdx(r._3)))
              .foreach { case (_, ts, typ) =>
                val t = us(ts)
                // Inline expiry — the SAME rule the EventTimeTimeout
                // enforces between batches, applied against this event's
                // time: a chain (or conversion tombstone) whose window has
                // passed can never be extended, so drop it and let this
                // event re-anchor. Without this, a continuously-active
                // user never times out (the timeout only fires in a batch
                // where the group has NO data, and line below keeps
                // bumping it past the watermark), so a dead chain would
                // block every later conversion and the output would depend
                // on micro-batch slicing. Cost: a cross-batch late event
                // that could still have extended the dropped chain is
                // lost — the same boundary the timeout path already has,
                // per the watermark-horizon contract above.
                if (st.times.nonEmpty && t > st.times.last + windowMillis * 1000L)
                  st = FunnelState(Nil, done = false)
                val k = st.times.length
                if (!st.done && typ == steps(k)) {
                  val qualifies = k == 0 ||
                    (t >= st.times.last && t <= st.times.last + windowMillis * 1000L)
                  if (qualifies) {
                    st = FunnelState(st.times :+ t, done = k + 1 == steps.length)
                    if (st.done)
                      out += ConversionOut(key, st.times.map(tsOf))
                  }
                }
              }
            if (st.times.isEmpty) state.remove()
            else {
              state.update(st)
              val wm = try state.getCurrentWatermarkMs()
                catch { case _: UnsupportedOperationException => Long.MinValue }
              // Done or not, the state is dead once the watermark passes
              // last_step + window: an incomplete chain can no longer be
              // extended, and a tombstone held that long makes conversions
              // at-most-once PER FUNNEL WINDOW (clearing it on the next
              // advance would let an immediate second chain re-convert).
              // ceiling µs→ms: plain division truncates, expiring the
              // state up to ~1ms BEFORE the exact last_step + window
              // boundary and dropping a still-completable chain whose
              // final step lands inside that sliver
              state.setTimeoutTimestamp(
                math.max((st.times.last + windowMillis * 1000L + 999L) / 1000L, wm + 1))
            }
            out.iterator
          }
        })
  }
}
