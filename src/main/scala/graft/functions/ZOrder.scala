package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding for multi-dimensional data layout
  * — the standard technique (Delta/Iceberg `OPTIMIZE ZORDER`) for
  * making parquet row-group min/max zone maps selective on TWO
  * dimensions at once. A table range-partitioned and sorted by the
  * interleaved key keeps every file/row-group inside a small tile of
  * the (a, b) plane, so predicates on EITHER dimension prune — unlike
  * a linear sort, which prunes only its leading column.
  *
  * Everything here is plain integer bit arithmetic on built-in
  * functions (shiftleft / bitwiseAND / bitwiseOR) — whole-stage
  * codegen'd, no UDFs — and each step is replayed literally in the
  * DuckDB oracle SQL.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` onto even bit positions 0,2,…,30
    * (the classic mask-shift doubling chain).
    */
  def spread16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val a = (m.bitwiseOR(shiftleft(m, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates: `a` on even bits,
    * `b` on odd.
    */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The identical spread chain as DuckDB SQL (stepwise CTE-free
    * nesting would be unreadable; callers give the four intermediate
    * column names).
    */
  def spreadSqlSteps(in: String, out: String): Seq[String] = Seq(
    s"(($in & 65535) | (($in & 65535) << 8)) & 16711935 AS ${out}_1",
    s"((${out}_1 | (${out}_1 << 4)) & 252645135) AS ${out}_2",
    s"((${out}_2 | (${out}_2 << 2)) & 858993459) AS ${out}_3",
    s"((${out}_3 | (${out}_3 << 1)) & 1431655765) AS $out")
}
