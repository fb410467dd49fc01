package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of join physical operator: semantics (latest
  * at-or-before, tie = last in tie order, null when nothing precedes),
  * plan shape (AsOfJoinExec with clustered+sorted children), and
  * parity with the union-trick `Resample.asofBackward` on real data.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def probes = Seq(
    (1L, 0.5), (1L, 2.0), (1L, 10.0), (2L, 1.0), (3L, 4.0))
    .toDF("user_id", "t")
  private def samples = Seq(
    (1L, 1.0, 10.0, 1L), (1L, 2.0, 20.0, 2L), (1L, 2.0, 21.0, 3L),
    (1L, 9.0, 30.0, 4L), (2L, 5.0, 40.0, 5L))
    .toDF("s_uid", "s_t", "v", "eid")

  test("latest at-or-before semantics with ties and no-match nulls") {
    val got = AsOfJoin.backward(probes, samples,
        Seq("user_id"), Seq("s_uid"), "t", "s_t", Seq("eid"))
      .select("user_id", "t", "v")
      .as[(Long, Double, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, 0.5, None),         // nothing precedes
      (1L, 2.0, Some(21.0)),   // equal time counts; eid tie → last wins
      (1L, 10.0, Some(30.0)),
      (2L, 1.0, None),         // sample exists but only later
      (3L, 4.0, None)))        // key with no samples at all
  }

  test("plans as AsOfJoinExec over sorted, clustered children — no window, no union") {
    val df = AsOfJoin.backward(probes, samples,
      Seq("user_id"), Seq("s_uid"), "t", "s_t", Seq("eid"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window") && !p.contains("Union"), p)
  }

  test("matches the union-trick asofBackward on the sf0.001 daily-grid backfill") {
    val dir = "/root/testdata/sf0.001"
    val s = graft.operators.SeriesOps.Series(Seq("user_id"), "tn", Seq("event_id"))
    val series = graft.sources.Tables.seriesNorm(spark, dir)
    val grid = graft.operators.Resample.uniformGrid(series, s, 86400.0)
    val expected = graft.operators.Resample
      .asofBackward(series, grid, s, "value", "asof_v")
      .select("user_id", "tn", "asof_v")
      .as[(Long, Double, Option[Double])].collect().toSet
    val renamed = series.select(col("user_id").as("s_uid"), col("tn").as("s_tn"),
      col("value").as("v"), col("event_id"))
    val got = AsOfJoin.backward(grid, renamed,
        Seq("user_id"), Seq("s_uid"), "tn", "s_tn", Seq("event_id"))
      .select(col("user_id"), col("tn"), col("v").as("asof_v"))
      .as[(Long, Double, Option[Double])].collect().toSet
    assert(got == expected)
  }
}
