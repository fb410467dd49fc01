package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` bridge the engine needs: build a DataFrame
  * from a custom LogicalPlan (for the graft physical operators whose
  * logical nodes have no public constructor path). This is the
  * standard technique Spark extension libraries use — a minimal shim
  * compiled into the `org.apache.spark.sql` namespace; everything
  * else in the engine uses only public APIs.
  */
object bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
