package graft

import graft.api.Graft
import graft.engine.{Annotation, FilterSpec}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end facade drive: the reference's documented headless
  * pipeline (load → filter → annotate → save → restore) on a small
  * trial CSV.
  */
class GraftApiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("headless pipeline end-to-end") {
    val dir = Files.createTempDirectory("graft-api")
    val csv = dir.resolve("trial.csv")
    val rows = (0 until 48).map(i => f"${i / 120.0}%.6f,${math.sin(i / 8.0) * 10}%.4f,P1")
    Files.writeString(csv, "normalized_time,gaze_heading_deg,participant_id\n"
      + rows.mkString("\n") + "\n")

    val trial = Graft.loadTrial(spark, csv.toString)
    assert(trial.schema.timeCol.contains("normalized_time"))
    assert(trial.schema.signalCols == Seq("gaze_heading_deg"))
    assert(trial.sampleRate == 120.0)

    val smoothed = Graft.applyFilter(spark, trial, Seq("gaze_heading_deg"),
      FilterSpec.Savgol(11, 2))
    assert(smoothed.count() == 48)

    val sess = Graft.openSession(trial)
    sess.applyDataFrame(smoothed, "filter:savgol")
    sess.annotate(Annotation(0.1, 0.2, "blink", track = "eye"))
    sess.deleteSegment(0.05, 0.08)
    assert(sess.state.df.count() < 48)

    val annPath = dir.resolve("ann.json").toString
    Graft.saveAnnotations(annPath, sess, trial.sampleRate)
    val restored = Graft.loadAnnotations(annPath, trial.df)
    assert(restored.annotations.map(_.label) == Vector("blink"))
    assert(restored.deletions == Vector((0.05, 0.08)))

    val outDir = dir.resolve("clean").toString
    Graft.saveClean(sess.state.df, outDir)
    val back = spark.read.option("header", true).csv(outDir)
    assert(back.count() == sess.state.df.count())

    val recipe =
      """[{"type":"filter","filter":"zscore","params":{},"channels":["gaze_heading_deg"]},
        |{"type":"derived","name":"g2","expr":"gaze_heading_deg * 2"}]""".stripMargin
    val replayed = Graft.replayRecipe(spark, recipe, trial.df, trial.series)
    assert(replayed.columns.contains("g2"))
    assert(replayed.count() == 48)

    // plugin discovery through the facade (apply_plugin path)
    val pdir = dir.resolve("plugins")
    Files.createDirectories(pdir)
    Files.writeString(pdir.resolve("gain.json"),
      """{"name": "gain", "type": "derived", "name2": "x",
        | "operations": [{"type": "derived", "name": "g3", "expr": "gaze_heading_deg * 3"}]}""".stripMargin)
    val plugins = Graft.loadPlugins(pdir.toString)
    val withPlugin = Graft.applyPlugin(spark, trial, plugins, "gain")
    assert(withPlugin.columns.contains("g3"))
    // unknown plugin is a no-op, like the reference's early return
    assert(Graft.applyPlugin(spark, trial, plugins, "nope").columns.sameElements(
      trial.df.columns))
  }

  test("previewFilter pairs original and filtered; resample interpolates onto the new grid") {
    val dir = Files.createTempDirectory("graft-preview")
    val csv = dir.resolve("trial.csv")
    val rows = (0 until 40).map(i => f"${i / 10.0}%.6f,${i.toDouble}%.4f,P1")
    Files.writeString(csv, "normalized_time,ch,participant_id\n"
      + rows.mkString("\n") + "\n")
    val trial = Graft.loadTrial(spark, csv.toString)

    // cardinality-preserving: row-for-row overlay, bounded by n
    val p = Graft.previewFilter(spark, trial, "ch", FilterSpec.MovingAverage(3), n = 5)
      .collect()
    assert(p.length == 5)
    assert(p.map(_.getAs[Double]("original")).toSeq == Seq(0.0, 1.0, 2.0, 3.0, 4.0))
    // centered window mean of the identity ramp ≈ the ramp except edges
    assert(p(2).getAs[Double]("filtered") == 2.0)

    // cardinality-changing: original is np.interp-ed onto the new grid
    // (reference main.py:714-716); ramp data interpolates exactly
    val r = Graft.previewFilter(spark, trial, "ch", FilterSpec.ResampleTo(0.25), n = 100)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val t = row.getAs[Double]("normalized_time")
      assert(math.abs(row.getAs[Double]("original") - t * 10.0) < 1e-9,
        s"at $t got ${row.getAs[Double]("original")}")
      assert(!row.isNullAt(row.fieldIndex("filtered")))
    }
  }

  test("bucketed materialization joins without a shuffle exchange") {
    import spark.implicits._
    val dim = (0L until 200L).map(k => (k, s"name_$k")).toDF("k", "name")
    val fact = (0L until 2000L).map(i => (i % 200L, i * 1.5)).toDF("k", "v")
    Graft.materializeBucketed(dim, "bk_dim", Seq("k"), 4, Seq("k"))
    Graft.materializeBucketed(fact, "bk_fact", Seq("k"), 4, Seq("k"))

    val joined = spark.sql(
      """SELECT /*+ MERGE(f) */ f.k, sum(f.v) AS sv, max(d.name) AS nm
        |FROM bk_fact f JOIN bk_dim d ON f.k = d.k
        |GROUP BY f.k""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    // co-located scan-to-join-to-agg: the bucket layout satisfies the
    // join and the aggregate's distribution, so no Exchange anywhere
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(joined.count() == 200)

    val expected = fact.groupBy("k").sum("v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    joined.collect().foreach(r => assert(r.getDouble(1) == expected(r.getLong(0))))
  }

  test("partitioned write prunes directories and caps file size") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = (0L until 1000L)
      .map(i => (i, if (i % 2 == 0) "train" else "val", s"lang${i % 3}", i * 0.5))
      .toDF("doc_id", "split", "lang", "quality")
    Graft.writePartitioned(df, out, Seq("split", "lang"),
      sortCols = Seq("quality"), maxRecordsPerFile = 100L)
    // hive-style partition directories exist
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.sorted.sameElements(Array("split=train", "split=val")))
    // a reader filtering on partition cols scans only matching files
    val read = spark.read.parquet(out)
    val pruned = read.filter(col("split") === "train" && col("lang") === "lang0")
      .queryExecution.executedPlan.toString
    assert(!pruned.contains("split=val"), "partition pruning failed")
    assert(read.count() == 1000)
    // maxRecordsPerFile: no output file exceeds the cap
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
    files.foreach { f =>
      assert(spark.read.parquet(f).count() <= 100, s"$f exceeds maxRecordsPerFile")
    }
    // rows inside a file are sorted by the sort column
    val one = spark.read.parquet(files.head).select("quality")
      .collect().map(_.getDouble(0)).toSeq
    assert(one == one.sorted, "intra-file sort order lost")
  }

  test("SQL surface: catalog views answer ANSI SQL with pushdown intact") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.api.Graft.sql(spark, dir,
      """SELECT n.n_name, count(*) AS n_cust
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n_cust DESC, n_name LIMIT 5""".stripMargin)
    assert(df.count() == 5)
    // the series view is queryable and its scan prunes columns
    val s = graft.api.Graft.sql(spark, dir,
      "SELECT user_id, count(*) AS n FROM series GROUP BY user_id")
    val scan = s.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(s.count() > 0)
    assert(!scan.contains("event_type"), s"unpruned scan:\n$scan")
  }
}
