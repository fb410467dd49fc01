package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression conversions,
  * so graft's native Catalyst expressions can be exposed as Columns.
  * (The conventional extension point for libraries shipping custom
  * expressions against the classic SparkSession.)
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function on an EXISTING session's registry (the
    * conf-time path is `spark.sql.extensions` → GraftExtensions).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Whether the session's CacheManager holds any cached-plan entries
    * (`private[sql]`, hence bridged). The no-leaked-cache suite guard
    * asserts this after each query's CacheScope drains — a stale entry
    * here means a `persist()` escaped its owner scope.
    */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** The persistent RDD behind an (eager) `localCheckpoint()` result —
    * its plan is a `LogicalRDD` leaf wrapping the checkpointed RDD.
    * Lets graft.CacheScope record checkpoint ownership PRECISELY (by
    * the id of the RDD the call created) instead of diffing the
    * SparkContext-global persistent-RDD map, which would mis-own a
    * concurrent thread's persists.
    */
  def checkpointedRddId(ds: Dataset[_]): Option[Int] =
    ds.queryExecution.analyzed.collectFirst {
      case l: execution.LogicalRDD => l.rdd.id
    }
}
