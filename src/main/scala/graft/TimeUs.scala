package graft

/** java.sql.Timestamp ⇄ epoch-micros without dropping sub-millisecond
  * precision: `getTime` truncates to milliseconds while the events tables
  * carry microseconds, so a fold keyed on `getTime` alone can reorder
  * sub-ms events and emit timestamps that never equal the batch
  * operator's. `floorDiv` (not `/`) keeps pre-epoch timestamps exact.
  *
  * Single-sourced here for every keyed streaming fold
  * (StreamingAnalytics, Funnel.conversionStream) — two private copies of
  * this arithmetic drifted once already; an edge-case fix must land in
  * exactly one place.
  */
private[graft] object TimeUs {
  def toUs(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(((us - math.floorDiv(us, 1000000L) * 1000000L) * 1000L).toInt)
    t
  }
}
