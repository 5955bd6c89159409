package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** THE cross-engine rounding convention: HALF_UP to 4 decimals via
  * `floor(x·10⁴ + 0.5)/10⁴` — chosen because engine-native `round()`
  * half-case behavior differs between Spark and DuckDB, while floor of
  * the shifted value is the same IEEE ops on both. The documented SQL
  * twin (spelled out inside oracle strings) is
  * `floor(x * 10000 + 0.5) / 10000`; any change here must change every
  * oracle fragment in lockstep or hashes drift.
  */
object Rounding {
  def roundAt(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + 0.5) / f
  }
  def round4(c: Column): Column = roundAt(c, 4)
  def round4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
}
