package graft

import java.nio.file.Files

import graft.sources.TrialReader
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 trial connector: value parity with the DataFrame
  * reader path, column pruning reaching the scan, and predicate
  * pushdown visible in the plan AND effective on the emitted rows.
  */
class TrialSourceV2Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.v2.TrialSource"

  private def writeCsv(body: String): String = {
    val dir = Files.createTempDirectory("graft-dsv2")
    val p = dir.resolve("trial.csv")
    Files.writeString(p, body)
    p.toString
  }

  private val fixture =
    """normalized_time,ch,label,duration [ms]
      |0.0,1.5,a,
      |0.5,nan,b,12
      |1.0,-2.25,a,NaN
      |1.5,4.0,,7
      |2.0,0.0,c,3
      |""".stripMargin

  test("schema inference: numeric vs string split, null tokens ignored") {
    val df = spark.read.format(Fmt).load(writeCsv(fixture))
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types == Map("normalized_time" -> "double", "ch" -> "double",
      "label" -> "string", "duration [ms]" -> "double"))
  }

  test("schema inference folds over ALL files — a header-only part can't retype columns") {
    // a multi-task write can put an empty (header-only) part first in
    // the sorted file list; the string column must still classify as
    // STRING from the later file (the sf0.1 q149 regression)
    val dir = Files.createTempDirectory("graft-dsv2-multi")
    Files.writeString(dir.resolve("part-0.csv"), "x,flag\n")
    Files.writeString(dir.resolve("part-1.csv"), "x,flag\n1.5,R\n2.5,A\n")
    val df = spark.read.format(Fmt).load(dir.toString)
    assert(df.schema("flag").dataType == org.apache.spark.sql.types.StringType)
    assert(df.select("flag").as[String].collect().sorted.toSeq == Seq("A", "R"))
  }

  test("value parity with TrialReader.loadCsv incl. nan->null normalization") {
    val p = writeCsv(fixture)
    val v2 = spark.read.format(Fmt).load(p)
      .orderBy("normalized_time").collect().map(_.toSeq)
    val v1 = TrialReader.loadCsv(spark, p)
      .orderBy("normalized_time").collect().map(_.toSeq)
    assert(v2.toSeq == v1.toSeq)
    // the nan cell really is null, not NaN
    assert(v2(1)(1) == null)
  }

  test("filter pushdown appears in the plan and prunes emitted rows") {
    val df = spark.read.format(Fmt).load(writeCsv(fixture))
      .filter(col("normalized_time") > 0.5 && col("ch").isNotNull)
      .select("normalized_time", "ch")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(normalized_time,0.5)"), plan)
    assert(plan.contains("IsNotNull(ch)"), plan)
    assert(df.as[(Double, Double)].collect().toSet ==
      Set((1.0, -2.25), (1.5, 4.0), (2.0, 0.0)))
  }

  test("column pruning narrows the scan's ReadSchema") {
    val df = spark.read.format(Fmt).load(writeCsv(fixture)).select("ch")
    // the V2 scan leaf must emit ONLY the projected column — pruning
    // reached the connector, not a post-scan Project
    val scanOut = df.queryExecution.executedPlan.collectLeaves().head.output.map(_.name)
    assert(scanOut == Seq("ch"), scanOut.toString)
    assert(df.as[Option[Double]].collect().flatten.toSet == Set(1.5, -2.25, 4.0, 0.0))
  }

  test("V2 write: overwrite sink round-trips values and nulls through the reader") {
    val dir = Files.createTempDirectory("graft-dsv2-write").toString + "/out"
    val df = Seq(
      (0.0, Some(1.5), "a"), (0.5, None, "b"), (1.0, Some(-2.25), "c"))
      .toDF("normalized_time", "ch", "label")
    df.repartition(2).write.format(Fmt).mode("overwrite").save(dir)
    // part files carry headers; a stale file from a prior write is gone
    df.limit(1).write.format(Fmt).mode("overwrite").save(dir)
    df.repartition(2).write.format(Fmt).mode("overwrite").save(dir)
    val back = spark.read.format(Fmt).load(dir)
      .orderBy("normalized_time").collect()
      .map(r => (r.getDouble(0), Option(r.get(1)), r.getString(2)))
    assert(back.toList == List(
      (0.0, Some(1.5), "a"), (0.5, None, "b"), (1.0, Some(-2.25), "c")))
  }

  test("directory load fans out one partition per trial file") {
    val dir = Files.createTempDirectory("graft-dsv2-multi")
    Files.writeString(dir.resolve("a.csv"), "normalized_time,ch\n0.0,1\n1.0,2\n")
    Files.writeString(dir.resolve("b.csv"), "normalized_time,ch\n0.0,3\n")
    val df = spark.read.format(Fmt).load(dir.toString)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.agg(sum("ch")).head().getDouble(0) == 6.0)
  }
}
