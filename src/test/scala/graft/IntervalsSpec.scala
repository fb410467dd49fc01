package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketized overlap join must return EXACTLY the theta-join
  * pairs — multi-bucket intervals must not duplicate, bucket-boundary
  * straddlers must not drop.
  */
class IntervalsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("overlap join: exact pairs, once each, across bucket spans") {
    val left = Seq(("A", 0.0, 250.0), ("B", 300.0, 310.0))
      .toDF("id", "start", "end")
    val right = Seq(
      ("X", 240.0, 260.0), // overlaps A in its last bucket
      ("Y", 100.0, 110.0), // overlaps A mid-span
      ("Z", 305.0, 400.0), // overlaps B; spans two buckets
      ("W", 50.0, 250.0),  // overlaps A across THREE shared buckets
      ("N", 260.0, 290.0)) // overlaps nothing
      .toDF("id", "start", "end")
    val got = Intervals.overlapJoin(left, right, "start", "end", 100.0)
      .select("l_id", "r_id").as[(String, String)].collect().toSeq.sorted
    assert(got == Seq(("A", "W"), ("A", "X"), ("A", "Y"), ("B", "Z")))
  }

  test("overlap join: inclusive bounds — touching endpoints pair") {
    val l = Seq(("L", 0.0, 100.0)).toDF("id", "start", "end")
    val r = Seq(("R", 100.0, 200.0)).toDF("id", "start", "end")
    assert(Intervals.overlapJoin(l, r, "start", "end", 60.0).count() == 1)
  }

  test("extra predicate narrows pairs") {
    val l = Seq((1L, 0.0, 10.0)).toDF("uid", "start", "end")
    val r = Seq((1L, 5.0, 15.0), (2L, 5.0, 15.0)).toDF("uid", "start", "end")
    val got = Intervals.overlapJoin(l, r, "start", "end", 100.0,
      col("l_uid") =!= col("r_uid"))
    assert(got.select("r_uid").as[Long].collect().toSeq == Seq(2L))
  }
}
