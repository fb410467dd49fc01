package graft

import graft.functions.ZOrder
import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: Morton-code correctness (interleave round-trips),
  * the tile-locality guarantee the zone-map pruning story rests on,
  * and the disjoint-z-range file property of the materialized layout.
  */
class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("interleave16 round-trips through bit deinterleaving") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (43690L, 21845L), (12345L, 54321L)).toDF("a", "b")
      .withColumn("z", ZOrder.interleave16(col("a"), col("b")))
    // deinterleave: gather even bits (a) and odd bits (b)
    val got = df.selectExpr("a", "b", "z",
      (0 until 16).map(i => s"((shiftright(z, ${2 * i}) & 1) << $i)").mkString("(", " + ", ") as da"),
      (0 until 16).map(i => s"((shiftright(z, ${2 * i + 1}) & 1) << $i)").mkString("(", " + ", ") as db"))
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, _, da, db) => assert(da == a && db == b) }
  }

  test("every 2^20-aligned z-block covers at most a 1024x1024 tile") {
    val blocks = SparkEntry.queries("q126_zorder_layout")(spark, "/root/testdata/sf0.001")
    val bad = blocks.filter(col("max_qt") - col("min_qt") >= 1024 ||
      col("max_qu") - col("min_qu") >= 1024).count()
    assert(bad == 0)
    assert(blocks.count() > 0)
  }

  test("materializeZOrdered writes files with disjoint z-ranges") {
    val path = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val z = Layout.eventZ(graft.sources.Tables.events(spark, "/root/testdata/sf0.001"))
    Layout.materializeZOrdered(z, path, "z", 4)
    val perFile = spark.read.parquet(path)
      .select(col("z"), input_file_name().as("f"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo")
      .as[(String, Long, Long)].collect()
    assert(perFile.length > 1)
    perFile.sliding(2).foreach { case Array((_, _, hi1), (_, lo2, _)) =>
      assert(hi1 <= lo2, "file z-ranges overlap — layout is not clustered")
    }
  }
}
