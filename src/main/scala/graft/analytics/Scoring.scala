package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's suspicious-score and entity-classification logic as pure
  * Catalyst column expressions (stats_dashboard.py:119-143). No UDFs — the
  * row-wise `apply(classify_ip_types, axis=1)` of the reference is plain
  * arithmetic (`least`/`greatest`/`round`), so it stays inside whole-stage
  * codegen and costs one projection at any scale.
  */
object Scoring {

  /** `2·failed + 3·ports + 0.5·total + 15·1(root>0) + 1·diversity`, clipped
    * at 100 (stats_dashboard.py:119-125).
    */
  def suspiciousScore(failed: Column, distinctPorts: Column, total: Column,
                      triedRootAdmin: Column, diversity: Column): Column =
    least(lit(100.0),
      lit(2.0) * failed + lit(3.0) * distinctPorts + lit(0.5) * total +
        lit(15.0) * (triedRootAdmin > 0).cast("int") + lit(1.0) * diversity)

  /** attacker-% component before normalization (stats_dashboard.py:133). */
  def attackerScore(score: Column, root: Column, failed: Column): Column =
    least(lit(100.0), lit(0.6) * score + lit(5.0) * root + lit(2.0) * failed)

  /** bot-% component before normalization (stats_dashboard.py:134). */
  def botScore(diversity: Column, ports: Column): Column =
    least(lit(100.0), lit(1.5) * diversity + lit(2.0) * ports)

  // HALF_UP rounding comes from graft.functions.Rounding.roundAt — the
  // repo-wide single definition (engine-native round() differs on half
  // cases; Python's round() is even half-even)
  private def rnd(c: Column, d: Int): Column = graft.functions.Rounding.roundAt(c, d)

  /** (attacker, bot, authorized) percentages, each rounded to 1 decimal
    * (stats_dashboard.py:127-143; the reference's Python round() is
    * half-even — we use the repo's floor-based HALF_UP everywhere so the
    * same query is oracle-checkable in DuckDB). Returned as three flat
    * columns rather than a struct so oracle comparison is column-by-column.
    */
  def classifyProfile(score: Column, failed: Column, ports: Column,
                      root: Column, diversity: Column): (Column, Column, Column) = {
    val attacker = attackerScore(score, root, failed)
    val bot = botScore(diversity, ports)
    val legit = greatest(lit(0.0), lit(100.0) - attacker - bot)
    val total = attacker + bot + legit
    (rnd(attacker * 100.0 / total, 1),
     rnd(bot * 100.0 / total, 1),
     rnd(legit * 100.0 / total, 1))
  }
}
