package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A shuffle join hash-partitions both sides by the join key, so a hot key
  * lands ENTIRELY in one task — with 600k rows over 5 event types, a plain
  * sort-merge join on event_type runs on 5 effective partitions no matter
  * how many executors exist. Salting restores parallelism: the big side
  * gets a deterministic salt in [0, buckets), the small side is exploded
  * buckets×, and the join key becomes (key, salt) — each hot key now
  * spreads over `buckets` tasks. Output is exactly the unsalted join.
  *
  * When to reach for which tool at 100 TB:
  *   - small side fits in memory → `broadcast()` (no shuffle at all; the
  *     salt is pointless). Salting is for the case where the small side is
  *     too big to broadcast AND the key distribution is skewed.
  *   - AQE's skew-join (spark.sql.adaptive.skewJoin) splits oversized
  *     partitions at runtime for sort-merge joins; explicit salting still
  *     wins when the skew is known ahead (no runtime replan, works for
  *     aggregating windows too, bounded small-side duplication).
  */
object SkewJoins {

  /** Inner equi-join with a salted key. `saltSource` must be a
    * deterministic expression over the big side (e.g. a hash of a unique
    * id) — `rand()` would break retry/replay determinism; a re-executed
    * task must salt identically.
    *
    * A null `saltSource` row falls into bucket 0 (coalesce) rather than
    * getting a null salt — a null salt would never equi-match and the row
    * would silently vanish from what must behave exactly like the
    * unsalted join. The salt column name is generated to not collide with
    * a pre-existing `_salt` on either input.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, saltSource: Column): DataFrame = {
    // buckets <= 0 would make pmod null (every big row salted to the
    // coalesce fallback) while the small side's (0 until buckets) explode
    // produces NOTHING — the join silently returns empty instead of
    // failing; surface the misuse
    require(buckets > 0, s"saltedJoin: buckets must be positive, got $buckets")
    val saltCol = Iterator.from(0).map(i => s"_graft_salt$i")
      .find(c => !big.columns.contains(c) && !small.columns.contains(c)).get
    val salted = big.withColumn(saltCol,
      coalesce(pmod(saltSource, lit(buckets.toLong)).cast("int"), lit(0)))
    val exploded = small.withColumn(saltCol,
      explode(array((0 until buckets).map(b => lit(b)): _*)))
    // Stage-bound the exploded side: Catalyst's static size estimate is
    // the PRE-explode small side, so a side just under the broadcast
    // threshold would physically broadcast buckets× that — the measured
    // round-9 blind-broadcast class. One shared definition
    // ([[Guards.stageBound]]); an explicit caller hint like j11's `merge`
    // still wins over AQE's runtime choice.
    salted.join(Guards.stageBound(exploded, col(key), col(saltCol)), Seq(key, saltCol))
      .drop(saltCol)
  }
}
