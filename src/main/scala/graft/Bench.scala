package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every declared query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Queries are materialized through the `noop` sink, NOT `.count()` —
  * counting lets Catalyst prune every computed column (a windowed
  * projection would benchmark as a bare parquet row count). The noop
  * write evaluates the full output rows while measuring zero sink IO.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE stays off HERE only: at bench scale every stage is
      // milliseconds and adaptive stage boundaries add ~15% (measured
      // 64.6 s -> 74.0 s at sf0.1; the iterative q70 doubles). The
      // deploy-facing session (api.Graft.sparkSession) enables AQE —
      // at 100 TB runtime re-planning (skew-join splitting, partition
      // coalescing) is the correct posture.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query attribution (see BenchDiag scaladoc): splits wall time
    // into task-run/CPU/GC/spill vs outside-task time so a sweep
    // anomaly like round 5's 50x series-window phantom is self-
    // explaining from the committed BENCH_DIAG.json artifact.
    val diag = new TaskMetricsListener
    spark.sparkContext.addSparkListener(diag)
    // JVM/codegen warmup so the first measured query isn't charged
    // for executor + whole-stage-codegen compilation.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // Local profiling aid: SPARK_GRAFT_ONLY=q66,q29 restricts the run
    // (substring match); the driver never sets it, so per-round bench
    // behavior is unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case Some(pats) => SparkEntry.allQueries.filter(q => pats.exists(q.name.contains))
      case None => SparkEntry.allQueries
    }
    // Best-of-N per query. Default 2: one-shot timings in a shared
    // 145-query JVM charge GC/heap state from earlier queries to
    // whoever runs next (round 4 showed 2-10x phantom "regressions"
    // on unchanged queries); min-of-2 separates that noise from real
    // plan changes. SPARK_GRAFT_REPEAT overrides for profiling.
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(2)
    val diagRecs = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[BenchDiag.Rec])]
    val results = selected.map { q =>
      // A FAILED query records -1, never its fail-fast wall time: an
      // analysis error takes ~0.1 s and would otherwise masquerade as
      // a 20x speedup in round-over-round comparisons (this is what
      // invalidated the round-3 events numbers).
      val recs = scala.collection.mutable.ArrayBuffer.empty[BenchDiag.Rec]
      val runs = (1 to repeat).map { _ =>
        // each repeat builds a fresh plan, so a query's internal
        // persist() registers a new cache entry per repeat — drop the
        // previous repeat's entries so repeats are memory-identical
        spark.catalog.clearCache()
        org.apache.spark.GraftListenerFlush.flush(spark.sparkContext)
        val ts0 = diag.snapshot
        val gc0 = BenchDiag.driverGcMs; val cpu0 = BenchDiag.processCpuMs
        val t0 = System.nanoTime()
        try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          org.apache.spark.GraftListenerFlush.flush(spark.sparkContext)
          recs += BenchDiag.Rec((dt * 1000).toLong, diag.snapshot - ts0,
            BenchDiag.driverGcMs - gc0, BenchDiag.processCpuMs - cpu0)
          dt
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name}: ${e.getMessage}")
            -1.0
        }
      }
      diagRecs += ((q.name, recs.toSeq))
      // best of the SUCCESSFUL repeats; -1 only when every repeat
      // failed (a transient failure must not erase real timings)
      val ok = runs.filter(_ >= 0)
      val dt = if (ok.nonEmpty) ok.min else -1.0
      // scope caches per query: intra-query persists (self-join
      // intermediates) stay effective, but nothing leaks into the
      // next query's memory budget — in a 69-query session the
      // accumulated MEMORY_AND_DISK relations would otherwise evict
      // unpredictably at larger SF
      spark.catalog.clearCache()
      // clearCache only drops catalog-tracked relations; RDD-level
      // blocks (iterative ops' localCheckpoints, layered-frontier
      // persists) stay pinned until GC and stack up across a
      // 146-query sweep — drop them explicitly
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // memory-sink tables from streaming queries hold their full
      // result in driver heap behind a temp view — drop them too
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
      spark.experimental.extraOptimizations = Nil // scope rules per query
      q.name -> dt
    }
    // The harness keeps only the last ~2000 chars of output; the JSON
    // line must START inside that window or the round records no perf
    // numbers (round 2's full-name map overflowed it). Keys are the
    // unambiguous qNN prefix; the full-name map goes to a sidecar file.
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    val nErrors = results.count(_._2 < 0)
    val errField = if (nErrors > 0) s""","errors":$nErrors""" else ""
    def mkLine(fmt: Double => String): String = {
      val qs = results.map { case (k, v) => "\"" + shortKey(k) + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$errField,"sf":"$sfDir"}"""
    }
    // Degrade per-query precision before the line can outgrow the
    // window (1 dp still ranks offenders; an unparseable round loses
    // ALL perf numbers, as round 2 did).
    val line = {
      val l2 = mkLine(v => f"$v%.2f")
      if (l2.length <= 1800) l2 else mkLine(v => f"$v%.1f")
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val full = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$full$errField,"sf":"$sfDir"}""" + "\n")
    catch { case _: Throwable => () }
    // Attribution sidecar: every repeat of every query with its task/
    // GC/CPU/spill split (BenchDiag scaladoc documents how to read it).
    try {
      val body = diagRecs.map { case (name, recs) =>
        s""""$name":[${recs.map(BenchDiag.recJson).mkString(",")}]"""
      }.mkString("{\"heapMbEnd\":" + BenchDiag.heapUsedMb + ",\"queries\":{", ",", "}}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_DIAG.json"), body + "\n")
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
