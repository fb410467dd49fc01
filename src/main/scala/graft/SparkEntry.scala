package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 (and the
  * training-pipeline extensions) is declared once as a [[QueryDef]] in
  * its operator module; this object only aggregates them into the
  * driver's `queries` / `oracleSql` maps.
  */
object SparkEntry {

  /** All declared capabilities, grouped by module. */
  def allQueries: Seq[QueryDef] =
    operators.Relational.all ++ operators.EventSeries.all ++
      operators.EventSeriesJoins.all ++ operators.Dedup.all ++
      operators.Similarity.all ++ operators.TextOps.all ++
      operators.CorpusOps.all ++ operators.PipelineOps.all ++
      operators.Sketches.all ++ operators.Intervals.all ++
      operators.AuditOps.all ++ operators.BehaviorOps.all ++
      operators.Graphs.all ++ operators.Layout.all ++
      operators.Multimodal.all ++ operators.RecipeQueries.all ++
      streaming.StreamingSessions.all ++ streaming.StreamingAsOf.all ++
      streaming.StreamingSketch.all ++ streaming.StreamingVectors.all ++
      streaming.StreamingAudit.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q02RevenueByNation.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
