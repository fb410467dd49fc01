package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned Parquet snapshots (S8 — the reference's periodic
  * autosave, /root/reference/main.py:1317-1355, re-expressed as
  * durable immutable versions: poor-man's time travel). Each save is
  * a new `v=<n>` directory; restore reads the latest (or any pinned)
  * version. Works on any Hadoop-compatible filesystem.
  */
object Checkpoints {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toInt).sorted
  }

  /** Write the next version; returns its number. */
  def save(spark: SparkSession, df: DataFrame, root: String): Int = {
    val v = versions(spark, root).lastOption.getOrElse(0) + 1
    df.write.mode("errorifexists").parquet(s"$root/v=$v")
    v
  }

  def load(spark: SparkSession, root: String, version: Int): DataFrame =
    spark.read.parquet(s"$root/v=$version")

  /** Latest snapshot, or None when nothing has been checkpointed. */
  def loadLatest(spark: SparkSession, root: String): Option[DataFrame] =
    versions(spark, root).lastOption.map(load(spark, root, _))
}
