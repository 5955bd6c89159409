package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Zone maps (per-shard/row-group min/max — the docstore's, or parquet's)
  * prune on ONE dimension only if the data is sorted on it: sort by
  * user_id and every shard's hour range spans everything, so an
  * `hour BETWEEN` predicate prunes nothing. Interleaving the bits of both
  * columns and range-partitioning on the interleaved value makes each
  * shard a dyadic BOX in (a, b) space — min/max stay tight on BOTH
  * columns, and a 2-D range query prunes every shard whose box misses it.
  * This is the standard multi-dimensional clustering technique of
  * warehouse table formats, expressed as plain Spark: the z-value is a
  * pure codegen'd bit-twiddling Column (no kernel, no UDF), and the
  * layout is `repartitionByRange` on it.
  *
  * Layout changes WHERE rows land, never WHAT a query returns — the
  * `s13_zorder_scan` oracle runs the same predicate over the original
  * table, and PlanCheck asserts the pruning (`Shards: kept/total`).
  */
object Layout {

  /** Spread the low 32 bits of `c` to the even bit positions of a long
    * (classic mask-shift cascade, 5 steps).
    */
  def spreadBits32(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton interleave of two non-negative 32-bit values: bits of `a` on
    * even positions, bits of `b` on odd.
    *
    * Input DOMAIN caveat: `b`'s bit 31 lands on the z-value's bit 63 —
    * the sign bit of the LongType result — so for b ≥ 2³¹ the z-value is
    * negative and the signed `repartitionByRange` splits the Morton curve
    * at the sign boundary (results stay correct — pruning reads real
    * min/max — but one shard straddles far-apart boxes and prunes
    * poorly). Values above 32 bits are masked. For full-range uint32
    * inputs (e.g. a 32-bit hash column), pre-shift to 31 bits
    * (`shiftright(x, 1)`) or flip the sign bit so the unsigned order
    * survives the signed sort; this repo's z-order carriers use small
    * non-negative domains where neither applies.
    */
  def zorder2(a: Column, b: Column): Column =
    spreadBits32(a).bitwiseOR(shiftleft(spreadBits32(b), 1))

  /** Cluster `df` for 2-D zone-map pruning on (a, b): range-partition into
    * `nShards` contiguous z-value ranges. Each output partition (= one
    * docstore shard / one parquet file) covers a dyadic box in (a, b), so
    * its per-column min/max are tight on both. One range shuffle — the
    * same cost as any global sort-for-layout — paid once at write time,
    * amortized over every pruned read after.
    */
  def zorderCluster(df: DataFrame, a: Column, b: Column, nShards: Int): DataFrame =
    df.repartitionByRange(nShards, zorder2(a, b))
}
