package graft.streaming

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming enrichment through the CUSTOM as-of operator: each
  * arriving event is joined to the latest at-or-before purchase of
  * its user — the classic "attach the last reference reading to every
  * live sample" backfill, composed from `readStream` → `foreachBatch`
  * → [[graft.plans.AsOfJoinExec]] (the batch inside foreachBatch is a
  * plain DataFrame, so the custom strategy plans the same
  * streaming-merge exec the batch path uses).
  *
  * Scale shape: per micro-batch, the probe side is the batch (small,
  * bounded by trigger) and the sample side the static reference —
  * both hash-cluster on the key, the merge is O(batch + samples) per
  * partition. A production variant snapshots the reference per
  * trigger; the harness replays the one-file table as a single batch
  * so the output is deterministic and oracle-checkable.
  */
object StreamingAsOf {

  /** ROW-semantics oracle (the exec's semantics, like DuckDB ASOF
    * JOIN): the struct wrapper is non-null for every purchase row
    * even when its value is null, so a null-valued purchase row wins
    * over an earlier non-null one.
    */
  val q127StreamAsof: QueryDef = QueryDef.sql(
    "q127_stream_asof",
    s"""WITH s AS (${Tables.seriesSql}),
       |u AS (SELECT user_id, t, event_id, CAST(NULL AS DOUBLE) AS v, 1 AS gg FROM s
       |  UNION ALL SELECT user_id, t, event_id, value, 0 FROM s WHERE event_type = 'purchase'),
       |w AS (SELECT *, (last_value(CASE WHEN gg = 0 THEN struct_pack(v := v) END
       |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, gg, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v AS asof_purchase FROM u)
       |SELECT user_id, event_id, t, asof_purchase FROM w WHERE gg = 1
       |ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    run(spark, dir).orderBy("user_id", "event_id")
  }

  /** Drive the stream to completion. `glob`/`oneFilePerTrigger` let
    * specs replay a multi-file copy batch-by-batch; `samplesOverride`
    * supplies the static reference when `dir` is such a copy. Because
    * each micro-batch probes independently against the static side,
    * the appended union across ANY batch split equals the single-
    * batch result (StreamingSpec pins this).
    */
  def run(spark: SparkSession, dir: String, glob: String = "events.parquet",
      oneFilePerTrigger: Boolean = false,
      samplesOverride: Option[DataFrame] = None,
      checkpoint: Option[String] = None,
      outPath: Option[String] = None): DataFrame = {
    val outDir = outPath.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-stream-asof").toString)
    val purchases = samplesOverride.getOrElse(Tables.series(spark, dir))
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("s_uid"), col("t").as("s_t"),
        col("value").as("s_v"), col("event_id").as("s_eid"))
    val schema = Tables.rawEventsSchema(spark, dir, glob)
    val reader = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob)
    val withTrigger =
      if (oneFilePerTrigger) reader.option("maxFilesPerTrigger", 1) else reader
    val stream = Tables.normalizeEventTs(withTrigger.parquet(dir))
      .selectExpr("user_id", "event_id",
        "cast(ts div 1000 as double) / 1e6 as t")
    val writer = stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.plans.AsOfJoin.backward(batch, purchases,
          Seq("user_id"), Seq("s_uid"), "t", "s_t", Seq("s_eid"))
        .select(col("user_id"), col("event_id"), col("t"),
          col("s_v").as("asof_purchase"))
        .write.mode("append").parquet(outDir)
    }
    // a checkpoint makes the drive resumable: a NEW run on the same
    // (checkpoint, outPath) picks up at the first unprocessed file —
    // the kill-and-resume contract StreamingSpec pins
    val q = checkpoint.fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir)
  }

  val all: Seq[QueryDef] = Seq(q127StreamAsof)
}
