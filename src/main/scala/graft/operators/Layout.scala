package graft.operators

import graft.QueryDef
import graft.functions.ZOrder
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order clustering of the event
  * table on (time, user) so parquet zone maps prune on BOTH
  * dimensions (SURVEY §4.3's layout tier; the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER`). A linearly-sorted 100 TB table
  * prunes only its leading sort column — a slice on the second
  * dimension scans everything; Morton-tiled files bound every
  * file/row-group inside a ~2^10×2^10 tile of the plane, so either
  * predicate skips.
  *
  * Determinism: both coordinates are EXACT INTEGERS (µs-grid time
  * quantized by integer division, user id masked to 16 bits) and the
  * Morton spread is pure bit arithmetic — bit-identical on any
  * engine; the oracle replays the identical mask-shift chain.
  */
object Layout {

  /** Quantized Morton coordinates for every event: 16-bit time rank
    * on the µs grid interleaved with the low 16 bits of the user id.
    * Quantization is divide-by-step (`step = (range div 65536) + 1`,
    * `qt = offset div step`), NOT multiply-then-divide: the multiply
    * form overflows int64 once the time range exceeds ~4.4 years
    * (`range · 65535 > 2^63`), and it divides by zero on a
    * single-instant table — this form is total and overflow-free for
    * any epoch range, still exact integer arithmetic on both engines.
    */
  def eventZ(events: DataFrame): DataFrame = {
    // ts is the raw parquet nanosecond long; µs grid = ts div 1000
    // (identical to DuckDB's epoch_us truncation — Tables.events)
    val tu = events.select(col("event_id"), col("user_id"),
      expr("ts div 1000").as("tu"))
    val mm = tu.agg(min("tu").as("mn"), max("tu").as("mx"))
    tu.crossJoin(broadcast(mm)) // 1-row bounds
      .withColumn("qt", expr("(tu - mn) div (((mx - mn) div 65536) + 1)"))
      .withColumn("qu", col("user_id").bitwiseAND(lit(65535L)))
      .withColumn("z", ZOrder.interleave16(col("qt"), col("qu")))
      .select("event_id", "qt", "qu", "z")
  }

  /** Z-ordered parquet materialization: range-partition on the Morton
    * key (files become DISJOINT z-ranges ⇒ tiles), sort within
    * partitions so row groups nest inside file tiles. The layout sink
    * companion to `Graft.materializeBucketed` / `writePartitioned`.
    */
  def materializeZOrdered(df: DataFrame, path: String, zCol: String,
      partitions: Int): DataFrame = {
    df.repartitionByRange(partitions, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Layout audit: per 2^20-aligned z-block (the top 6 Morton bits of
    * each dimension), the row count and the covered (qt, qu) extents.
    * Every block must sit inside a 1024×1024 tile — the locality
    * guarantee zone-map pruning rests on (spec-pinned; the oracle
    * hash-checks the exact extents).
    */
  val q126ZorderLayout: QueryDef = QueryDef.sql(
    "q126_zorder_layout",
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tu FROM events),
       |b AS (SELECT min(tu) AS mn, max(tu) AS mx FROM e),
       |q AS (SELECT event_id, (tu - mn) // (((mx - mn) // 65536) + 1) AS qt,
       |    user_id & 65535 AS qu FROM e, b),
       |s1 AS (SELECT event_id, qt, qu,
       |    ${ZOrder.spreadSqlSteps("qt", "st").head},
       |    ${ZOrder.spreadSqlSteps("qu", "su").head} FROM q),
       |s2 AS (SELECT *, ${ZOrder.spreadSqlSteps("qt", "st")(1)},
       |    ${ZOrder.spreadSqlSteps("qu", "su")(1)} FROM s1),
       |s3 AS (SELECT *, ${ZOrder.spreadSqlSteps("qt", "st")(2)},
       |    ${ZOrder.spreadSqlSteps("qu", "su")(2)} FROM s2),
       |s4 AS (SELECT *, ${ZOrder.spreadSqlSteps("qt", "st")(3)},
       |    ${ZOrder.spreadSqlSteps("qu", "su")(3)} FROM s3),
       |z AS (SELECT event_id, qt, qu, st | (su << 1) AS z FROM s4)
       |SELECT z // 1048576 AS z_block, count(*) AS n,
       |  min(qt) AS min_qt, max(qt) AS max_qt,
       |  min(qu) AS min_qu, max(qu) AS max_qu
       |FROM z GROUP BY 1 ORDER BY z_block""".stripMargin) { (spark, dir) =>
    eventZ(Tables.events(spark, dir))
      .withColumn("z_block", expr("z div 1048576"))
      .groupBy("z_block")
      .agg(count(lit(1)).as("n"),
        min("qt").as("min_qt"), max("qt").as("max_qt"),
        min("qu").as("min_qu"), max("qu").as("max_qu"))
      .orderBy("z_block")
  }

  val all: Seq[QueryDef] = Seq(q126ZorderLayout)
}
