package graft

import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.SessionRow
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Streaming semantics beyond the single-batch oracle harness: the
  * keyed session state must RESUME across micro-batches (tn origin,
  * open-session aggregates, session numbering), with re-emissions of
  * a boundary-crossing session resolving by the upsert contract
  * (latest (user, session_id) row wins). The final upserted view must
  * equal the one-batch run exactly.
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("sessionization resumes across micro-batches (upsert = batch result)") {
    val dir = "/root/testdata/sf0.001"
    // split events into two files ON TIME (ordered arrival, as a real
    // ingest would deliver them) so batch 2 continues batch 1's data
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-batches").toString
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=2")
    // flatten the two part files into lexicographically ordered names
    // so maxFilesPerTrigger=1 replays them in time order
    val fs = new java.io.File(tmp)
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))

    // drive the two-batch stream through foreachBatch, upserting by key
    val upserted = mutable.LinkedHashMap[(Long, Long), SessionRow]()
    var batches = 0
    val q = StreamingSessions
      .sessionStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SessionRow], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted((r.user_id, r.session_id)) = r)
        ()
      }
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected one micro-batch per file, got $batches")

    val single = StreamingSessions.run(spark, dir, "streaming_spec_single")
      .as[SessionRow].collect()
      .map(r => (r.user_id, r.session_id) -> r).toMap
    assert(upserted.size == single.size,
      s"multi-batch upsert has ${upserted.size} sessions, single-batch ${single.size}")
    upserted.foreach { case (k, r) =>
      val s = single(k)
      assert(r == s, s"session $k diverged:\n  multi : $r\n  single: $s")
    }
  }

  test("out-of-order arrival never corrupts sessions (zero-lateness drop)") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ooo-batches").toString
    // deliver the LATER half first: batch 2's events are all older
    // than batch 1's carried state — the late-data drop must hold
    // s_start <= s_end on every emitted row
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val rows = mutable.ArrayBuffer[SessionRow]()
    val q = StreamingSessions
      .sessionStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[SessionRow], _: Long) =>
        rows ++= df.collect(); ()
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.s_start <= r.s_end && r.n > 0,
      s"corrupted session from late data: $r"))
  }

  test("funnel state resumes across micro-batches (upsert = batch result)") {
    import graft.streaming.StreamingSessions.FunnelRow
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel-batches").toString
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))

    val upserted = mutable.LinkedHashMap[Long, FunnelRow]()
    var batches = 0
    val q = StreamingSessions
      .funnelStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[FunnelRow], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted(r.user_id) = r)
        ()
      }
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected one micro-batch per file, got $batches")

    val single = StreamingSessions.funnelStream(spark, dir)
    val sq = single.writeStream.format("memory")
      .queryName("funnel_spec_single").outputMode("append").start()
    sq.processAllAvailable()
    sq.stop()
    val singleRows = spark.table("funnel_spec_single").as[FunnelRow].collect()
      .map(r => r.user_id -> r).toMap
    assert(upserted.size == singleRows.size)
    upserted.foreach { case (k, r) =>
      assert(r == singleRows(k), s"funnel $k diverged:\n  multi : $r\n  single: ${singleRows(k)}")
    }
  }

  test("ewma stream resumes across micro-batches, bit-equal to batch kernel") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ewma-batches").toString
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val rows = mutable.ArrayBuffer[StreamingSessions.EwmaRow]()
    var batches = 0
    val q = StreamingSessions
      .ewmaStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingSessions.EwmaRow], _: Long) =>
        batches += 1; rows ++= df.collect(); ()
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected one micro-batch per file, got $batches")
    // append-mode: each sample emitted once, and the carried IIR state
    // must make the stream's doubles BIT-equal to the batch kernel
    val batch = graft.operators.EventSeriesJoins.q110Ewma.fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(rows.size == batch.size,
      s"stream emitted ${rows.size} rows, batch has ${batch.size}")
    rows.foreach { r =>
      val (tn, y) = batch((r.user_id, r.event_id))
      assert(r.tn == tn && r.smoothed == y,
        s"ewma diverged at (${r.user_id}, ${r.event_id}): stream (${r.tn}, ${r.smoothed}) vs batch ($tn, $y)")
    }
  }

  test("kalman stream resumes across micro-batches, bit-equal to batch kernel") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-kalman-batches").toString
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val rows = mutable.ArrayBuffer[StreamingSessions.KalmanRow]()
    var batches = 0
    val q = StreamingSessions
      .kalmanStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingSessions.KalmanRow], _: Long) =>
        batches += 1; rows ++= df.collect(); ()
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected one micro-batch per file, got $batches")
    // the carried (y, p) state must make the stream's doubles BIT-equal
    // to the one-shot batch kernel
    val batch = graft.operators.EventSeriesJoins.q180KalmanLevel.fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(rows.size == batch.size,
      s"stream emitted ${rows.size} rows, batch has ${batch.size}")
    rows.foreach { r =>
      val (tn, y) = batch((r.user_id, r.event_id))
      assert(r.tn == tn && r.level == y,
        s"kalman diverged at (${r.user_id}, ${r.event_id}): stream (${r.tn}, ${r.level}) vs batch ($tn, $y)")
    }
  }

  test("chisq drift stream: two-batch upsert equals the batch contingency table") {
    val dir = "/root/testdata/sf0.001"
    val docsTbl = graft.sources.Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-chisq-batches").toString
    def writeHalf(pred: org.apache.spark.sql.Column, name: String): Unit = {
      docsTbl.filter(pred).coalesce(1).write.parquet(s"$tmp/stage_$name")
      val part = new java.io.File(s"$tmp/stage_$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/documents_$name.parquet"))
    }
    writeHalf(col("doc_id") % 2 === 0, "a")
    writeHalf(col("doc_id") % 2 === 1, "b")
    val upserted = mutable.LinkedHashMap[(String, String), Long]()
    var batches = 0
    val q = graft.streaming.StreamingAudit
      .langCountStream(spark, tmp, glob = "documents_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.StreamingAudit.LangCount], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted((r.source, r.lang)) = r.n)
        ()
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2)
    val batch = docsTbl.groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(upserted.toMap == batch)
  }

  test("scd2 stream: two-batch upsert equals the batch history") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-scd2-batches").toString
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val upserted = mutable.LinkedHashMap[(Long, Long), StreamingSessions.Scd2Row]()
    var batches = 0
    val q = StreamingSessions
      .scd2Stream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingSessions.Scd2Row], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted((r.user_id, r.version)) = r)
        ()
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2)
    val batch = graft.operators.BehaviorOps.q207Scd2History.fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getBoolean(5), r.getLong(6)))
      .toMap
    assert(upserted.size == batch.size,
      s"stream holds ${upserted.size} intervals, batch has ${batch.size}")
    upserted.foreach { case (k, r) =>
      val b = batch(k)
      assert((r.state, r.valid_from, r.valid_to, r.is_current, r.n_events) == b,
        s"scd2 diverged at $k: stream $r vs batch $b")
    }
  }

  test("gini stream: two-batch upsert equals the batch statistic") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-gini-batches").toString
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val upserted = mutable.LinkedHashMap[String, (Long, Long)]()
    var batches = 0
    val q = graft.streaming.StreamingAudit
      .giniStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.StreamingAudit.GiniRow], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted(r.event_type) = (r.n, r.gini_ppm))
        ()
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2)
    val batch = graft.operators.BehaviorOps.q202GiniConcentration.fn(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(upserted.toMap == batch)
  }

  test("hazard stream: two-batch fold (append gaps + upsert censors) equals batch") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-hazard-batches").toString
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val gaps = mutable.ArrayBuffer[(Long, String, Long)]()
    val censors = mutable.LinkedHashMap[(Long, String), Long]()
    var batches = 0
    val q = graft.streaming.StreamingAudit
      .hazardStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.StreamingAudit.HazardObs], _: Long) =>
        batches += 1
        df.collect().foreach { o =>
          if (o.kind == "gap") gaps += ((o.user_id, o.event_type, o.dtm))
          else censors((o.user_id, o.event_type)) = o.dtm
        }
        ()
      }
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2)
    // batch derivation of the same observation multiset
    val series = graft.sources.Tables.seriesNorm(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val typeOw = Window.partitionBy("user_id", "event_type").orderBy("tn", "event_id")
    val userW = Window.partitionBy("user_id")
    val d = series
      .withColumn("tnext", lead(col("tn"), 1).over(typeOw))
      .withColumn("tend", max("tn").over(userW))
      .select(col("user_id"), col("event_type"),
        expr("CAST(round((coalesce(tnext, tend) - tn) * 1000.0) AS BIGINT)").as("dtm"),
        col("tnext").isNull.as("cens"))
      .collect()
    val batchGaps = d.filter(!_.getBoolean(3))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val batchCens = d.filter(_.getBoolean(3))
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gaps.sorted.toSeq == batchGaps.sorted.toSeq)
    assert(censors.toMap == batchCens)
  }

  test("stream as-of: a two-batch replay equals the single-batch result") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-asof-batches").toString
    events.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val samples = graft.sources.Tables.series(spark, dir)
    val twoBatch = graft.streaming.StreamingAsOf
      .run(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true,
        samplesOverride = Some(samples))
      .collect().map(_.toSeq).toSet
    val oneBatch = graft.streaming.StreamingAsOf.run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(twoBatch == oneBatch)
    assert(oneBatch.nonEmpty)
  }

  test("stream restart from checkpoint resumes sketch state without reprocessing") {
    import graft.streaming.StreamingSketch
    import graft.streaming.StreamingSketch.KmvRow
    val dir = "/root/testdata/sf0.001"
    val docsTbl = graft.sources.Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-kmv-ckpt").toString
    val ckpt = s"$tmp/ckpt"
    def writeHalf(pred: org.apache.spark.sql.Column, name: String): Unit = {
      docsTbl.filter(pred).coalesce(1).write.parquet(s"$tmp/stage_$name")
      val part = new java.io.File(s"$tmp/stage_$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/documents_$name.parquet"))
    }
    val upserted = mutable.LinkedHashMap[String, KmvRow]()
    var batches = 0
    def runToCompletion(): Unit = {
      val q = StreamingSketch
        .kmvStream(spark, tmp, glob = "documents_*.parquet", oneFilePerTrigger = true)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[KmvRow], _: Long) =>
          batches += 1
          df.collect().foreach(r => upserted(r.source) = r)
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
    }
    // phase 1: only the even half exists; process and STOP the query
    writeHalf(col("doc_id") % 2 === 0, "a")
    runToCompletion()
    val batchesAfterA = batches
    assert(batchesAfterA >= 1)
    // phase 2: the odd half arrives; a NEW query on the SAME
    // checkpoint must resume the carried sketch state and read only
    // the new file (no reprocessing of phase 1)
    writeHalf(col("doc_id") % 2 === 1, "b")
    runToCompletion()
    assert(batches == batchesAfterA + 1,
      s"restart reprocessed old files: $batchesAfterA -> $batches")
    val single = StreamingSketch.run(spark, dir, "kmv_ckpt_single")
      .as[KmvRow].collect().map(r => r.source -> r).toMap
    assert(upserted.size == single.size)
    upserted.foreach { case (k, r) => assert(r == single(k), s"source $k diverged") }
  }

  // --------------------------------------------------------------
  // Kill-and-resume parity for the four flatMapGroupsWithState audit
  // monitors (q171/q194/q212/q226): phase 1 processes only file _a
  // with a checkpoint and the query STOPS; file _b arrives and a NEW
  // query on the SAME checkpoint must resume the carried keyed state
  // reading only the new file (exactly one more micro-batch), and the
  // folded view must equal the single-batch run — the same contract
  // the sketch path pins above.
  // --------------------------------------------------------------

  /** Two-phase checkpointed drive of `mkStream`: runs to completion
    * after each `writeHalf`, asserts the resume processed exactly one
    * extra micro-batch, and feeds every emitted row to `fold`.
    */
  private def killAndResume[T](tag: String,
      writeHalf: (String, String) => Unit,
      mkStream: (String, String) => org.apache.spark.sql.Dataset[T])(
      fold: T => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-$tag-ckpt").toString
    val ckpt = s"$tmp/ckpt"
    var batches = 0
    def runToCompletion(): Unit = {
      val q = mkStream(tmp, s"${tag}_*.parquet").writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[T], _: Long) =>
          batches += 1
          df.collect().foreach(fold)
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
    }
    writeHalf(tmp, s"${tag}_a.parquet")
    runToCompletion()
    val afterA = batches
    assert(afterA >= 1)
    writeHalf(tmp, s"${tag}_b.parquet")
    runToCompletion()
    assert(batches == afterA + 1,
      s"restart reprocessed old files: $afterA -> $batches")
  }

  /** Writes the time-ordered halves of `events` one call at a time
    * (first call = early half), as a real checkpointed ingest would
    * deliver them.
    */
  private def eventHalfWriter(): (String, String) => Unit = {
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val cut = events.select(percentile_approx(col("ts"), lit(0.5), lit(1000)))
      .head().getLong(0)
    var phase = 0
    (tmp, name) => {
      phase += 1
      val half = if (phase == 1) events.filter(col("ts") <= cut)
        else events.filter(col("ts") > cut)
      half.coalesce(1).write.parquet(s"$tmp/stage_$phase")
      val part = new java.io.File(s"$tmp/stage_$phase").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/$name"))
    }
  }

  test("burst monitor restart: checkpoint resumes hourly-count state (q171)") {
    import graft.streaming.StreamingAudit
    import graft.streaming.StreamingAudit.BurstRow
    val upserted = mutable.LinkedHashMap[(String, Long), BurstRow]()
    killAndResume[BurstRow]("burstck", eventHalfWriter(),
      (tmp, glob) => StreamingAudit.burstStream(spark, tmp, glob, oneFilePerTrigger = true)) {
      r => upserted((r.event_type, r.h)) = r
    }
    val single = StreamingAudit.run(spark, "/root/testdata/sf0.001", "burst_ckpt_single")
      .collect().map { r =>
        val b = BurstRow(r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))
        (b.event_type, b.h) -> b
      }.toMap
    assert(upserted.nonEmpty && upserted.toMap == single)
  }

  test("chisq monitor restart: checkpoint resumes contingency state (q194)") {
    import graft.streaming.StreamingAudit
    import graft.streaming.StreamingAudit.LangCount
    val docsTbl = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    var phase = 0
    val writeHalf: (String, String) => Unit = (tmp, name) => {
      phase += 1
      val half = if (phase == 1) docsTbl.filter(col("doc_id") % 2 === 0)
        else docsTbl.filter(col("doc_id") % 2 === 1)
      half.coalesce(1).write.parquet(s"$tmp/stage_$phase")
      val part = new java.io.File(s"$tmp/stage_$phase").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$tmp/$name"))
    }
    val upserted = mutable.LinkedHashMap[(String, String), Long]()
    killAndResume[LangCount]("chisqck", writeHalf,
      (tmp, glob) => StreamingAudit.langCountStream(spark, tmp, glob, oneFilePerTrigger = true)) {
      r => upserted((r.source, r.lang)) = r.n
    }
    val single = StreamingAudit.runChisq(spark, "/root/testdata/sf0.001", "chisq_ckpt_single")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(upserted.nonEmpty && upserted.toMap == single)
  }

  test("gini monitor restart: checkpoint resumes value-histogram state (q212)") {
    import graft.streaming.StreamingAudit
    import graft.streaming.StreamingAudit.GiniRow
    val upserted = mutable.LinkedHashMap[String, (Long, Long)]()
    killAndResume[GiniRow]("ginick", eventHalfWriter(),
      (tmp, glob) => StreamingAudit.giniStream(spark, tmp, glob, oneFilePerTrigger = true)) {
      r => upserted(r.event_type) = (r.n, r.gini_ppm)
    }
    val batch = graft.operators.BehaviorOps
      .q202GiniConcentration.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(upserted.nonEmpty && upserted.toMap == batch)
  }

  test("hazard monitor restart: checkpoint resumes per-user gap state (q226)") {
    import graft.streaming.StreamingAudit
    import graft.streaming.StreamingAudit.HazardObs
    val gaps = mutable.ArrayBuffer[(Long, String, Long)]()
    val censors = mutable.LinkedHashMap[(Long, String), Long]()
    killAndResume[HazardObs]("hazardck", eventHalfWriter(),
      (tmp, glob) => StreamingAudit.hazardStream(spark, tmp, glob, oneFilePerTrigger = true)) {
      o =>
        if (o.kind == "gap") gaps += ((o.user_id, o.event_type, o.dtm))
        else censors((o.user_id, o.event_type)) = o.dtm
    }
    // single-batch emission: complete gaps are append-only, censored
    // tails carry the upsert key — same fold as the two-batch test
    val singleGaps = mutable.ArrayBuffer[(Long, String, Long)]()
    val singleCens = mutable.LinkedHashMap[(Long, String), Long]()
    StreamingAudit.runHazard(spark, "/root/testdata/sf0.001", "hazard_ckpt_single")
      .collect().foreach { r =>
        val (u, tpe, kind, dtm) = (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))
        if (kind == "gap") singleGaps += ((u, tpe, dtm))
        else singleCens((u, tpe)) = dtm
      }
    assert(gaps.nonEmpty)
    assert(gaps.sorted.toSeq == singleGaps.sorted.toSeq)
    assert(censors.toMap == singleCens.toMap)
  }

  test("funnel restart: checkpoint resumes per-user funnel state (q104)") {
    import graft.streaming.StreamingSessions
    import graft.streaming.StreamingSessions.FunnelRow
    val upserted = mutable.LinkedHashMap[Long, FunnelRow]()
    killAndResume[FunnelRow]("funnelck", eventHalfWriter(),
      (tmp, glob) => StreamingSessions.funnelStream(spark, tmp, glob, oneFilePerTrigger = true)) {
      r => upserted(r.user_id) = r
    }
    val single = StreamingSessions.funnelStream(spark, "/root/testdata/sf0.001")
    val sq = single.writeStream.format("memory")
      .queryName("funnel_ckpt_single").outputMode("append").start()
    sq.processAllAvailable()
    sq.stop()
    val singleRows = spark.table("funnel_ckpt_single").as[FunnelRow].collect()
      .map(r => r.user_id -> r).toMap
    assert(upserted.nonEmpty && upserted.toMap == singleRows)
  }

  test("kalman restart: checkpoint resumes (y, p) filter state bit-exactly (q186)") {
    import graft.streaming.StreamingSessions
    import graft.streaming.StreamingSessions.KalmanRow
    val rows = mutable.ArrayBuffer[KalmanRow]()
    killAndResume[KalmanRow]("kalmanck", eventHalfWriter(),
      (tmp, glob) => StreamingSessions.kalmanStream(spark, tmp, glob, oneFilePerTrigger = true)) {
      r => rows += r
    }
    val batch = graft.operators.EventSeriesJoins.q180KalmanLevel
      .fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(rows.size == batch.size,
      s"stream emitted ${rows.size} rows across the restart, batch has ${batch.size}")
    rows.foreach { r =>
      val (tn, y) = batch((r.user_id, r.event_id))
      assert(r.tn == tn && r.level == y,
        s"kalman diverged after restart at (${r.user_id}, ${r.event_id})")
    }
  }

  test("scd2 restart: checkpoint resumes the open-run interval state (q208)") {
    import graft.streaming.StreamingSessions
    import graft.streaming.StreamingSessions.Scd2Row
    // upsert contract: latest (user, version) row wins — the phase-1
    // open run is superseded when phase 2 closes or extends it
    val upserted = mutable.LinkedHashMap[(Long, Long), Scd2Row]()
    killAndResume[Scd2Row]("scd2ck", eventHalfWriter(),
      (tmp, glob) => StreamingSessions.scd2Stream(spark, tmp, glob, oneFilePerTrigger = true)) {
      r => upserted((r.user_id, r.version)) = r
    }
    val single = StreamingSessions
      .runScd2(spark, "/root/testdata/sf0.001", "scd2_ckpt_single")
      .as[Scd2Row].collect()
      .map(r => (r.user_id, r.version) -> r).toMap
    assert(upserted.nonEmpty && upserted.toMap == single)
  }

  test("sessionize restart: checkpoint resumes the open-session state (q60)") {
    import graft.streaming.StreamingSessions
    import graft.streaming.StreamingSessions.SessionRow
    val upserted = mutable.LinkedHashMap[(Long, Long), SessionRow]()
    killAndResume[SessionRow]("sessck", eventHalfWriter(),
      (tmp, glob) => StreamingSessions.sessionStream(spark, tmp, glob, oneFilePerTrigger = true)) {
      r => upserted((r.user_id, r.session_id)) = r
    }
    val single = StreamingSessions
      .run(spark, "/root/testdata/sf0.001", "sess_ckpt_single")
      .as[SessionRow].collect()
      .map(r => (r.user_id, r.session_id) -> r).toMap
    assert(upserted.nonEmpty && upserted.toMap == single)
  }

  test("ewma restart: checkpoint resumes the smoothing state bit-exactly (q117)") {
    import graft.streaming.StreamingSessions
    import graft.streaming.StreamingSessions.EwmaRow
    val rows = mutable.ArrayBuffer[EwmaRow]()
    killAndResume[EwmaRow]("ewmack", eventHalfWriter(),
      (tmp, glob) => StreamingSessions.ewmaStream(spark, tmp, glob, oneFilePerTrigger = true)) {
      r => rows += r
    }
    val batch = graft.operators.EventSeriesJoins.q110Ewma
      .fn(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(rows.size == batch.size,
      s"stream emitted ${rows.size} rows across the restart, batch has ${batch.size}")
    rows.foreach { r =>
      val (tn, y) = batch((r.user_id, r.event_id))
      assert(r.tn == tn && r.smoothed == y,
        s"ewma diverged after restart at (${r.user_id}, ${r.event_id})")
    }
  }

  test("stream KMV: sketch state folds across batches to the exact batch sketch") {
    import graft.streaming.StreamingSketch
    import graft.streaming.StreamingSketch.KmvRow
    val dir = "/root/testdata/sf0.001"
    val docsTbl = graft.sources.Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-kmv-batches").toString
    docsTbl.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$tmp/b=1")
    docsTbl.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/documents_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/documents_b.parquet"))
    // two-batch upsert view: latest row per source wins
    val upserted = mutable.LinkedHashMap[String, KmvRow]()
    var batches = 0
    val q = StreamingSketch
      .kmvStream(spark, tmp, glob = "documents_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[KmvRow], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted(r.source) = r)
        ()
      }
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected one micro-batch per file, got $batches")
    val single = StreamingSketch.run(spark, dir, "kmv_spec_single")
      .as[KmvRow].collect().map(r => r.source -> r).toMap
    assert(upserted.size == single.size)
    upserted.foreach { case (k, r) => assert(r == single(k), s"source $k diverged") }
  }

  test("stream IVF monitor: distortion state folds across batches to the batch sums") {
    import graft.streaming.StreamingVectors
    import graft.streaming.StreamingVectors.ListRow
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-batches").toString
    // the codebook (vec_id < 16) must be present for BOTH the static
    // centroid read and the assignment literal, so it rides in file 1
    emb.filter(col("vec_id") < 250).coalesce(1).write.parquet(s"$tmp/b=1")
    emb.filter(col("vec_id") >= 250).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/embeddings_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/embeddings_b.parquet"))
    val upserted = mutable.LinkedHashMap[Long, ListRow]()
    var batches = 0
    val q = StreamingVectors
      .distortionStream(spark, tmp, glob = "embeddings_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[ListRow], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted(r.list_id) = r)
        ()
      }
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected one micro-batch per file, got $batches")
    val single = StreamingVectors
      .distortionStream(spark, tmp, glob = "embeddings_*.parquet")
      .writeStream.format("memory").queryName("ivf_spec_single").outputMode("append").start()
    single.processAllAvailable()
    single.stop()
    val one = spark.table("ivf_spec_single").as[ListRow].collect()
      .map(r => r.list_id -> r).toMap
    assert(upserted.size == one.size)
    upserted.foreach { case (k, r) => assert(r == one(k), s"list $k diverged") }
  }

  test("stream DAU: HLL register state folds across batches to the batch rollup") {
    import graft.streaming.StreamingSketch
    import graft.streaming.StreamingSketch.DauRow
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-dau-batches").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val upserted = mutable.LinkedHashMap[Long, DauRow]()
    var batches = 0
    val q = StreamingSketch
      .dauStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DauRow], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted(r.day) = r)
        ()
      }
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected one micro-batch per file, got $batches")
    val single = StreamingSketch.runDau(spark, dir, "dau_spec_single")
      .as[DauRow].collect().map(r => r.day -> r).toMap
    assert(upserted.size == single.size)
    upserted.foreach { case (k, r) => assert(r == single(k), s"day $k diverged") }
  }

  test("stream burst: late baseline data revokes a premature alert (upsert view = batch)") {
    import graft.streaming.StreamingAudit
    import graft.streaming.StreamingAudit.BurstRow
    val dir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-burst-batches").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$tmp/b=1")
    events.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$tmp/b=2")
    def partOf(sub: String): java.io.File =
      new java.io.File(s"$tmp/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(partOf("b=1").toPath,
      java.nio.file.Paths.get(s"$tmp/events_a.parquet"))
    java.nio.file.Files.move(partOf("b=2").toPath,
      java.nio.file.Paths.get(s"$tmp/events_b.parquet"))
    val upserted = mutable.LinkedHashMap[(String, Long), BurstRow]()
    var batches = 0
    val q = StreamingAudit
      .burstStream(spark, tmp, glob = "events_*.parquet", oneFilePerTrigger = true)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[BurstRow], _: Long) =>
        batches += 1
        df.collect().foreach(r => upserted((r.event_type, r.h)) = r)
        ()
      }
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches >= 2, s"expected one micro-batch per file, got $batches")
    val single = StreamingAudit.run(spark, dir, "burst_spec_single")
      .as[BurstRow].collect().map(r => (r.event_type, r.h) -> r).toMap
    assert(upserted.size == single.size)
    upserted.foreach { case (k, r) => assert(r == single(k), s"cell $k diverged") }
  }

  // --------------------------------------------------------------
  // Kill-and-resume parity for the two JOIN-state streams (VERDICT r7
  // task 5): q85's stream-stream interval join buffers both sides'
  // unmatched rows in the state store; q127's as-of enrichment holds
  // only file-source progress (each batch probes the static reference
  // independently). Both must resume from the checkpoint reading ONLY
  // the new file and produce batch-equal output across the kill.
  // --------------------------------------------------------------

  test("stream-stream interval join restart: checkpoint resumes buffered join state (q85)") {
    import graft.streaming.StreamingSessions
    val tmp = java.nio.file.Files.createTempDirectory("graft-sjck").toString
    val ckpt = s"$tmp/ckpt"
    val writeHalf = eventHalfWriter()
    // append contract (not upsert): each matched pair emits exactly
    // once, so the multiset across both phases must equal the
    // single-run multiset — a reprocessed phase-1 file would surface
    // as duplicate pairs here even before the batch-count assert
    val rows = mutable.ArrayBuffer[(Long, Long, Long, Double)]()
    var dataBatches = 0
    def runToCompletion(): Unit = StreamingSessions.withStateShuffle(spark, 8) {
      val q = StreamingSessions
        .streamJoined(spark, tmp, "sjck_*.parquet", oneFilePerTrigger = true)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = df.collect()
          // watermark advancement runs no-data cleanup batches; only
          // data batches count toward the no-reprocessing assert
          if (got.nonEmpty) dataBatches += 1
          got.foreach(r => rows += ((r.getLong(0), r.getLong(1),
            r.getLong(2), r.getDouble(3))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
    }
    writeHalf(tmp, "sjck_a.parquet")
    runToCompletion()
    val afterA = dataBatches
    val rowsAfterA = rows.size
    assert(afterA >= 1 && rowsAfterA > 0)
    writeHalf(tmp, "sjck_b.parquet")
    runToCompletion()
    assert(dataBatches == afterA + 1,
      s"restart reprocessed old files: $afterA -> $dataBatches data batches")
    assert(rows.size > rowsAfterA, "resume emitted no new matches")
    val single = StreamingSessions
      .runStreamJoin(spark, "/root/testdata/sf0.001", "sj_ckpt_single")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.size == single.length,
      s"restart multiset size ${rows.size} != single-run ${single.length}")
    assert(rows.groupBy(identity).view.mapValues(_.size).toMap ==
      single.groupBy(identity).view.mapValues(_.size).toMap,
      "pair multiset diverged across the kill")
  }

  test("stream as-of enrichment restart: checkpoint resumes file progress (q127)") {
    import graft.streaming.StreamingAsOf
    val sfDir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft-asofck").toString
    val ckpt = s"$tmp/ckpt"
    val out = s"$tmp/out"
    val writeHalf = eventHalfWriter()
    // the static reference side comes from the canonical table; the
    // STREAM side is the two-phase file copy
    val samples = graft.sources.Tables.series(spark, sfDir)
    def commits(): Int = {
      val d = new java.io.File(s"$ckpt/commits")
      if (!d.exists()) 0
      else d.listFiles().count(f => f.getName.forall(_.isDigit))
    }
    writeHalf(tmp, "asofck_a.parquet")
    StreamingAsOf.run(spark, tmp, "asofck_*.parquet", oneFilePerTrigger = true,
      samplesOverride = Some(samples), checkpoint = Some(ckpt), outPath = Some(out))
    val afterA = commits()
    val rowsAfterA = spark.read.parquet(out).count()
    assert(afterA >= 1 && rowsAfterA > 0)
    writeHalf(tmp, "asofck_b.parquet")
    StreamingAsOf.run(spark, tmp, "asofck_*.parquet", oneFilePerTrigger = true,
      samplesOverride = Some(samples), checkpoint = Some(ckpt), outPath = Some(out))
    assert(commits() == afterA + 1,
      s"restart reprocessed old files: $afterA -> ${commits()} commits")
    // batch-equal across the kill: the appended union equals the
    // declared q127 result (each micro-batch probes independently)
    val got = spark.read.parquet(out)
      .select("user_id", "event_id", "t", "asof_purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).sortBy(t => (t._1, t._2)).toSeq
    val single = graft.streaming.StreamingAsOf.q127StreamAsof.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(got.nonEmpty && got == single, "as-of output diverged across the kill")
  }
}
