package graft

import org.apache.spark.sql.GraftExpressionBridge
import org.scalatest.funsuite.AnyFunSuite

/** No-leaked-cache guard (VERDICT r7 task 2): every declared query,
  * run under its own [[CacheScope]], must leave the session exactly as
  * cached as it found it — WITHOUT the harness's blanket
  * clearCache/unpersist-all. This is the library-caller contract: an
  * api.Vectors / api.Corpus user wrapping one call in
  * `CacheScope.run` must not accumulate cached relations.
  *
  * Cost control: building a query's plan registers every builder
  * `persist()` in the CacheManager eagerly (and the iterative ops —
  * CC, BFS, k-core, q209 — even run their loops at build time), so
  * the guard only pays a full noop-write execution for queries that
  * actually left something cached or pinned at build; pure-lazy
  * queries are checked at plan level, where a persist would already
  * have surfaced.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every query's caches drain with its CacheScope — no survivors, none untracked") {
    val sc = spark.sparkContext
    // other suites share this session; guard against NEW leaks only
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.catalog.clearCache()
    val baseline = sc.getPersistentRDDs.keySet.toSet
    val leaks = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.allQueries.foreach { q =>
      CacheScope.run(sc) {
        val df = q.fn(spark, dir)
        val cachedAtBuild = !GraftExpressionBridge.cacheManagerIsEmpty(spark) ||
          sc.getPersistentRDDs.keySet.exists(!baseline.contains(_))
        if (cachedAtBuild) df.write.format("noop").mode("overwrite").save()
      }
      val leftover = sc.getPersistentRDDs.keySet.filterNot(baseline.contains)
      if (leftover.nonEmpty)
        leaks += s"${q.name}: ${leftover.size} persistent RDD(s) survived the scope"
      if (!GraftExpressionBridge.cacheManagerIsEmpty(spark))
        leaks += s"${q.name}: CacheManager entry survived the scope"
      if (CacheScope.lastSweep.sweptUntracked > 0)
        leaks += s"${q.name}: ${CacheScope.lastSweep.sweptUntracked} persist(s) untracked (swept by id, catalog entry went stale)"
      // clean up between queries so one leak doesn't cascade the report
      sc.getPersistentRDDs.values
        .filter(r => !baseline.contains(r.id)).foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
      spark.experimental.extraOptimizations = Nil
    }
    assert(leaks.isEmpty, s"\n${leaks.mkString("\n")}")
  }
}
