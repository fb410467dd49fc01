package graft
import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.Explain <queryName> [sfDir]`
  * prints the formatted physical plan (and with arg `opt` the
  * optimized logical plan) — the iterate-on-the-plan loop the scale
  * work depends on.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (mode == "opt") println(df.queryExecution.optimizedPlan.treeString)
    else df.explain(mode)
    spark.stop()
  }
}
