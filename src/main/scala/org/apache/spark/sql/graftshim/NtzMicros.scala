package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, UnixMicros}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.TimestampType

/** The one place the engine reaches past the public column API: a
  * `Cast(ntz → timestamp)` with its zone pinned to UTC at
  * construction.
  *
  * Why it must exist: every SQL-level route from TIMESTAMP_NTZ to
  * epoch micros goes through a session-zone coercion —
  * `unix_micros(to_utc_timestamp(ts,'UTC'))` shifts by the zone
  * offset outright, and `timestampdiff(MICROSECOND, epoch, ts)`
  * cancels the offset for ordinary wall times but is LOSSY for wall
  * times inside the session zone's DST spring-forward gap (the
  * ntz→timestamp cast maps nonexistent local times forward, +1h).
  * A cast whose `timeZoneId` is UTC is bijective — UTC has no gaps —
  * so the stored micros survive for EVERY wall time under ANY
  * session zone. `ResolveTimeZone` only fills empty zone ids, so the
  * explicit UTC is preserved through analysis.
  *
  * Kept to one expression shape so
  * [[graft.plans.InferScanBounds]] can invert it for parquet scan
  * pruning (`UnixMicros(Cast(ntz, TimestampType, Some("UTC")))`).
  */
object NtzMicros {
  /** Stored epoch-µs of a TIMESTAMP_NTZ column, independent of
    * `spark.sql.session.timeZone` including DST-gap wall times.
    */
  def ntzEpochMicros(c: Column): Column =
    ExpressionUtils.column(
      UnixMicros(Cast(ExpressionUtils.expression(c), TimestampType, Some("UTC"))))
}
