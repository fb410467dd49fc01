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

  test("pagerank ppm matches a hand-rolled integer reference exactly") {
    // path graph 1-2-3 symmetrized: degrees 1,2,1
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val got = graft.operators.Graphs.pageRankPpm(edges, 3)
      .orderBy("node")
      .as[(Long, Long)].collect().toSeq
    // replicate the exact integer recurrence
    val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    val out = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    var r = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
    (1 to 3).foreach { _ =>
      val contrib = r.map { case (n, v) => n -> v / deg(n) }
      r = Seq(1L, 2L, 3L).map { n =>
        val s = out.collect { case (src, ds) if ds.contains(n) => contrib(src) }.sum
        n -> (150000L + 85L * s / 100L)
      }.toMap
    }
    assert(got == Seq(1L, 2L, 3L).map(n => (n, r(n))))
  }

  test("bfs hops: path graph distances, frontier stops at the round budget") {
    // path 1-2-3-4-5 symmetrized; 3 rounds from node 1 reaches 4, not 5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val src = edges.agg(min("src").as("s"))
    val got = graft.operators.Graphs.bfsHops(edges, src, 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(0L), 2L -> Some(1L), 3L -> Some(2L),
      4L -> Some(3L), 5L -> None))
  }

  test("triangle counts: K4 gives 3 per node, a star gives none, counts are exact") {
    // K4 on {1,2,3,4} (C(4,3)=4 triangles, each node in 3) plus a
    // 5-leaf star at 10 (wedges everywhere, zero closures)
    val und = ((for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)) ++ (11L to 15L).map(l => (10L, l))).toDF("u", "v")
    val got = graft.operators.Graphs.triangleCounts(und)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
