package graft

import graft.operators.AuditOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture invariants of the audit operators (q150-q154) that
  * the oracle hash can't express: known lift values, saturation-curve
  * accounting identities, novelty extremes, planted cross-source
  * overlap, and closed-form Mann-Kendall statistics.
  */
class AuditOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_audit").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q150 collocation lift: planted bigram corpus has the closed-form lift") {
    // 5 x "new york" + 5 x "aa bb": N = 10 bigrams, each pair count 5,
    // each word count 5 -> lift = 5 * 10 / (5 * 5) = 2.0 = 2_000_000 ppm
    val dir = docsDir((1L to 5L).map(i => (i, "new york", "en", "web")) ++
      (6L to 10L).map(i => (i, "aa bb", "en", "web")))
    val got = AuditOps.q150CollocationLift.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5))).toSet
    assert(got == Set(("aa", "bb", 5L, 2000000L), ("new", "york", 5L, 2000000L)))
  }

  test("q150 lift on real data: cutoff respected, lift consistent with its factors") {
    val out = AuditOps.q150CollocationLift.fn(spark, "/root/testdata/sf0.001")
    assert(out.filter(col("n_pair") < 5).isEmpty)
    assert(out.count() > 0)
    // each row's lift reproduces from its own count columns and the
    // corpus bigram total (recomputed independently here)
    val n = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.functions.TextHash.shingles(col("text"), 2)).as("b"))
      .count()
    assert(out.filter(
      expr(s"lift_ppm != n_pair * 1000000L * ${n}L div (n_w1 * n_w2)")).isEmpty)
  }

  test("q151 dedup saturation: accounting identities on a planted mix") {
    // ids spread over all 10 md5 buckets; 20 rows, 11 distinct texts
    val rows = (1L to 10L).map(i => (i, "shared duplicate body text", "en", "web")) ++
      (11L to 20L).map(i => (i, s"unique body number $i", "en", "web"))
    val dir = docsDir(rows)
    val got = AuditOps.q151DedupSaturation.fn(spark, dir)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (_, rowsCum, distinctCum, dupPpm) = got.last
    assert(rowsCum == 20L)
    assert(distinctCum == 11L)
    assert(dupPpm == (20L - 11L) * 1000000L / 20L)
    // cumulative counts are monotone and distinct never exceeds rows
    got.sliding(2).foreach {
      case Array((_, r1, d1, _), (_, r2, d2, _)) =>
        assert(r2 >= r1 && d2 >= d1)
      case _ =>
    }
    got.foreach { case (_, r, d, _) => assert(d <= r) }
  }

  test("q152 novelty: all-unique doc scores 1e6 ppm, clone pair scores 0") {
    val dir = docsDir(Seq(
      (1L, "wholly original five word sentence", "en", "web"),
      (2L, "the very same cloned body", "en", "web"),
      (3L, "the very same cloned body", "en", "web")))
    val got = AuditOps.q152NgramNovelty.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got(1L)._2 == 1000000L)
    assert(got(2L)._2 == 0L && got(3L)._2 == 0L)
    // 5 words -> 3 trigrams
    assert(got(1L)._1 == 3L)
  }

  test("q153 source overlap: planted shared span is counted, disjoint pair is absent") {
    val span = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val dir = docsDir(Seq(
      (1L, s"web opening $span web closing words", "en", "web"),
      (2L, s"book preface $span book epilogue text", "en", "book"),
      (3L, "entirely disjoint wiki content with no spans shared anywhere across sources at all", "en", "wiki")))
    val got = AuditOps.q153SourceOverlap.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.contains(("book", "web")), got.toString)
    assert(got(("book", "web")) == 1L) // exactly the planted span digest
    assert(!got.keySet.exists { case (a, b) => a == "wiki" || b == "wiki" })
  }

  test("q155 semdedup: planted clone is pruned, low-cosine member survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    // centroids = vec_id < 16 = the one-hot basis e_0..e_15;
    // vec 16 = e_3 (cos 1 with centroid-member 3 -> pruned);
    // vec 17 = 0.3*e_9 + 0.29 elsewhere: L2-nearest list is 9, but
    // cos(v17, e_9) = 0.3/sqrt(1.3515) ~= 0.258 < 0.3 -> kept
    val basis = (0 until 16).map(i =>
      (i.toLong, Array.tabulate(16)(j => if (j == i) 1.0f else 0.0f).toSeq, 0))
    val clone = Seq((16L, Array.tabulate(16)(j => if (j == 3) 1.0f else 0.0f).toSeq, 0))
    val spread = Seq((17L, Array.tabulate(16)(j => if (j == 9) 0.3f else 0.29f).toSeq, 0))
    (basis ++ clone ++ spread).toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
        "cast(label as int) as label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.q155SemdedupPrune.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(16L) == ((3L, 1L, false)), got.toString) // pruned by vec 3
    assert(got(17L) == ((9L, 0L, true)), got.toString)  // survives in list 9
    // orthogonal basis members never prune each other
    (0 until 16).foreach(i => assert(got(i.toLong)._3, s"centroid $i pruned"))
  }

  test("q157 seasonal decompose: constant hourly series has zero seasonal mass") {
    val dir = java.nio.file.Files.createTempDirectory("graft_seasonal").toString
    val hour = 3600L * 1000000000L
    // 48 hours x exactly 3 events per hour -> trend == count everywhere
    val rows = for (h <- 0 until 48; k <- 0 until 3)
      yield ((h * 3 + k).toLong, h * hour + k * 1000000000L, 1L, 1.0, "click")
    rows.toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q157SeasonalDecompose.fn(spark, dir).collect()
    assert(got.length == 24)
    got.foreach { r =>
      assert(r.getLong(2) == 2L, r.toString)     // 48h -> 2 samples per hod
      assert(r.getLong(3) == 0L, r.toString)     // zero detrended mass
      assert(r.getDouble(4) == 0.0, r.toString)
    }
  }

  test("q158 quality-vs-dup: totals reconcile with an independent dup census") {
    val sfDir = "/root/testdata/sf0.001"
    val out = AuditOps.q158QualityVsDup.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d = graft.sources.Tables.documents(spark, sfDir)
    assert(out.map(_._2).sum == d.count())
    val dupDocs = d.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    assert(out.map(_._3).sum == dupDocs)
    out.foreach { case (_, n, nd, ppm) =>
      assert(nd <= n && ppm == nd * 1000000L / n)
    }
  }

  test("q159 BPE merges: weighted pair counts on a planted vocabulary") {
    // "banana banana" (x1 doc) + "ana": banana n=2 -> ba:2 an:4 na:4;
    // ana n=1 -> an:1 na:1. totals an:5 na:5 ba:2 (tie breaks to 'an')
    val dir = docsDir(Seq(
      (1L, "banana banana", "en", "web"),
      (2L, "ana", "en", "web")))
    val got = AuditOps.q159BpeMerges.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("an", 5L), ("na", 5L), ("ba", 2L)))
  }

  test("q160 retention cohorts: planted weekly activity gives the known matrix") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retention").toString
    val week = 7L * 86400L * 1000000000L
    // user 1: weeks 0,1,2; user 2: weeks 0,2; user 3: week 1
    val rows = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 2L), (3L, 1L))
      .zipWithIndex.map { case ((u, w), i) =>
        (i.toLong, w * week + u * 1000000000L, u, 1.0, "click")
      }
    rows.toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q160RetentionCohorts.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((0L, 0L)) == ((2L, 2L, 1000000L)))
    assert(got((0L, 1L)) == ((1L, 2L, 500000L)))
    assert(got((0L, 2L)) == ((2L, 2L, 1000000L)))
    assert(got((1L, 0L)) == ((1L, 1L, 1000000L)))
    assert(got.size == 4)
  }

  test("q161 attribution: in-window touch credits its channel, stale/no touch -> none") {
    val dir = java.nio.file.Files.createTempDirectory("graft_attr").toString
    val rows = Seq(
      (0L, 0L, 1L, "view"), (1L, 100L, 1L, "purchase"),      // 100 s gap -> view
      (2L, 0L, 2L, "click"), (3L, 7200L, 2L, "purchase"),    // 2 h gap -> none
      (4L, 0L, 3L, "purchase"))                              // no touch -> none
      .map { case (id, sec, u, et) => (id, sec * 1000000000L, u, 1.0, et) }
    rows.toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventSeriesJoins.q161Attribution.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got("view")._1 == 1L && got("view")._2 == 100000L && got("view")._3 == 100000.0)
    assert(got("none")._1 == 2L && got("none")._2 == 0L && got("none")._3.isNaN)
    assert(got.size == 2)
  }

  test("q162 Theil-Sen: linear counts give slope 1, constant gives 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
    val day = 86400L * 1000000000L
    val up = for (d <- 0 until 4; k <- 0 to d)
      yield (d.toLong * 10 + k, d * day + k * 1000000000L, 1L, 1.0, "click")
    val flat = for (d <- 0 until 4; k <- 0 until 2)
      yield (100L + d * 10 + k, d * day + k * 1000000000L, 1L, 1.0, "view")
    (up ++ flat).toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q162TheilSen.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("click") == ((6L, 1.0)))
    assert(got("view") == ((6L, 0.0)))
  }

  test("q163 domain cross-entropy: disjoint vocabularies pay the OOV escape") {
    // A = "aa aa", B = "bb bb": diagonal bits floor(log2(2/2)) = 0;
    // cross cells are all-OOV at length(bin(2)) = 2 bits per token
    val dir = docsDir(Seq(
      (1L, "aa aa", "en", "srcA"),
      (2L, "bb bb", "en", "srcB")))
    val got = AuditOps.q163DomainXent.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(("srcA", "srcA")) == ((2L, 0L)))
    assert(got(("srcB", "srcB")) == ((2L, 0L)))
    assert(got(("srcA", "srcB")) == ((2L, 4L)))
    assert(got(("srcB", "srcA")) == ((2L, 4L)))
  }

  test("q164 sliding WAU: merged registers equal a direct window recompute") {
    val sfDir = "/root/testdata/sf0.001"
    val out = AuditOps.q164SlidingWau.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute each day's trailing-7-day distinct register count
    // directly from the raw (day, user-hash) relation
    val t = graft.sources.Tables.events(spark, sfDir)
      .select(expr("(ts div 1000) div 86400000000").as("d"),
        graft.functions.TextHash.base32(col("user_id").cast("string")).as("h"))
      .distinct()
      .select(col("d"), shiftright(col("h"), 20).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = t.map(_._1).distinct
    days.foreach { d =>
      val expect = t.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).distinct.length
      assert(out(d) == expect.toLong, s"day $d")
    }
    assert(out.size == days.length)
  }

  test("q165 ANN recall: hits bounded by k and reconciles with the two searches") {
    val sfDir = "/root/testdata/sf0.001"
    val out = graft.operators.Similarity.q165AnnRecall.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 10)
    val exact = graft.operators.Similarity.q45CosineTopK.fn(spark, sfDir)
      .filter(col("rank") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.operators.Similarity.q47AnnTopK.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (q, (n, hits, ppm)) =>
      assert(n == exact.count(_._1 == q))
      assert(hits == (exact.filter(_._1 == q) & approx).size)
      assert(ppm == hits * 1000000L / n)
    }
  }

  test("q166 RFM: planted purchase history gets the closed-form class") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rfm").toString
    val day = 86400L * 1000000000L
    // user 1: 12 purchases of 10.0 ending on day 40 (r=0,f=12,m=120000 -> 111)
    // user 2: 1 purchase of 5.0 on day 20 (r=20,f=1,m=5000 -> 233)
    val rows = (0 until 12).map(i =>
        (i.toLong, (29L + i) * day, 1L, 10.0, "purchase")) ++
      Seq((100L, 20L * day, 2L, 5.0, "purchase"),
        (101L, 40L * day, 3L, 1.0, "view")) // non-purchase: excluded
    rows.toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q166RfmSegments.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == ((0L, 12L, 120000L, "111")))
    assert(got(2L) == ((20L, 1L, 5000L, "233")))
    assert(!got.contains(3L))
  }

  test("q167 burst detect: a planted 10x hour fires, the flat tail stays silent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_burst").toString
    val hour = 3600L * 1000000000L
    // hours 0..29 at 2 events; hour 30 at 20 events (baseline n=24, all 2s
    // -> variance 0, spike passes trivially); hours 31..35 back to 2
    val rows = ((0 until 30) ++ (31 until 36)).flatMap(h =>
        (0 until 2).map(k => (h * 10L + k, h * hour + k * 1000000000L))) ++
      (0 until 20).map(k => (900L + k, 30 * hour + k * 1000000000L))
    rows.zipWithIndex.map { case ((_, ts), i) => (i.toLong, ts, 1L, 1.0, "click") }
      .toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q167BurstDetect.fn(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toList == List((30L, 20L)), got.mkString(","))
  }

  test("q169 TF-IDF doc similarity: shared rare terms give cosine 1, no cross pairs") {
    // zebra/quokka df=2 (kept), narwhal/capybara df=1 (dropped):
    // docs 1-2 share the full filtered set -> sim 1.0; so do 3-4
    val dir = docsDir(Seq(
      (1L, "zebra quokka", "en", "web"),
      (2L, "zebra quokka", "en", "web"),
      (3L, "axolotl narwhal", "en", "web"),
      (4L, "axolotl capybara", "en", "web")))
    val got = graft.operators.TextOps.q169TfidfDocsim.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == Set((1L, 2L), (3L, 4L)), got.toString)
    assert(got((1L, 2L)) == ((2L, 1.0)))
    assert(got((3L, 4L)) == ((1L, 1.0)))
  }

  test("q170 power iteration: rank-1 data recovers the planted direction") {
    val dir = java.nio.file.Files.createTempDirectory("graft_power").toString
    // every vector is c_i * u with u = 0.1*e0 + 1.0*e5 -> the dominant
    // principal direction is u; max-abs scaling pins v_micro[5] = 1e6
    val u = Array.tabulate(64)(j => if (j == 0) 0.1f else if (j == 5) 1.0f else 0.0f)
    val rows = (1 to 20).map(i => (i.toLong, u.map(_ * i).toSeq, 0))
    rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
        "cast(label as int) as label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.q170PowerIteration.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 1000000L, got.toString)
    assert(math.abs(got(0L) - 100000L) < 2000L, got.toString) // ~0.1 ratio
    (1 until 64).filter(_ != 5).foreach(j => assert(math.abs(got(j.toLong)) < 2000L))
  }

  test("q172 Wilson: 40/100 outranks 1/1, bound below the naive rate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wilson").toString
    val rows = Seq((0L, 1L, "purchase")) ++                         // user 1: 1/1
      (1 to 100).map(i => (i.toLong, 2L,
        if (i <= 40) "purchase" else "view"))                       // user 2: 40/100
    rows.zipWithIndex.map { case ((_, u, et), i) =>
        (i.toLong, i * 1000000000L, u, 1.0, et) }
      .toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q172WilsonRank.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (n1, k1, lb1) = got(1L); val (n2, k2, lb2) = got(2L)
    assert((n1, k1) == ((1L, 1L)) && (n2, k2) == ((100L, 40L)))
    assert(lb2 > lb1, s"$lb2 !> $lb1") // confidence beats a lucky 1-for-1
    assert(lb2 < 0.4 && lb2 > 0.3)     // bound sits below the naive 0.4
  }

  test("q173 conversion latency: planted latencies hit the closed-form quantiles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_convlat").toString
    // four users, one cohort day: view at t=0, click at +5s,
    // purchase at +10/20/30/40s -> p50 = 25, p90 = 37, mean = 25
    val rows = (1 to 4).flatMap { u =>
      val base = u * 100L // seconds; same day
      Seq((u * 10L, base, u.toLong, "view"), (u * 10L + 1, base + 5, u.toLong, "click"),
        (u * 10L + 2, base + u * 10L, u.toLong, "purchase"))
    }
    rows.map { case (id, sec, u, et) => (id, sec * 1000000000L, u, 1.0, et) }
      .toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q173ConversionLatency.fn(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 25.0, r.toString) // mean
    assert(r.getDouble(3) == 25.0, r.toString) // p50
    assert(r.getDouble(4) == 37.0, r.toString) // p90
  }

  test("q174 rendezvous: churn only flows TO the new shard, at ~1/9 volume") {
    val sfDir = "/root/testdata/sf0.001"
    val out = AuditOps.q174RendezvousShards.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = out.map(_._2).sum
    val moved = out.map(_._3).sum
    assert(total == graft.sources.Tables.documents(spark, sfDir).count())
    // HRW guarantee: adding shard 8 moves roughly 1/9 of keys (binomial
    // tolerance), and every moved key lands ON the new shard
    assert(moved * 9 > total / 2 && moved * 9 < total * 2, s"moved=$moved total=$total")
    out.foreach { case (s8, _, _) => assert(s8 >= 0 && s8 < 8) }
  }

  test("q175 HLL calibration: corrected estimates land within 5% of exact") {
    val out = AuditOps.q175HllCalibration.fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getLong(1); val nZero = r.getLong(3); val raw = r.getDouble(4)
      // raw is out-of-regime at tiny cardinalities (that is the point
      // of reporting it); the linear-counting branch must calibrate
      val corrected = graft.operators.Sketches.hllCorrected(nZero, raw)
      assert(math.abs(corrected - exact) <= math.max(2.0, 0.05 * exact),
        s"${r.getString(0)}: exact=$exact corrected=$corrected raw=$raw")
    }
  }

  test("q176 decayed LTV: a 4-week-old purchase is worth 1/16 of a fresh one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ltv").toString
    val week = 7L * 86400L * 1000000000L
    Seq(
      (0L, 4L * week, 1L, 8.0, "purchase"),   // fresh (week 4 = now)
      (1L, 0L * week, 1L, 8.0, "purchase"),   // 4 weeks old -> 8000 >> 4 = 500
      (2L, 4L * week, 2L, 1.0, "view"))       // non-purchase ignored
      .toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q176DecayedLtv.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((2L, 16000L, 8500L)), got.toString)
    assert(!got.contains(2L))
  }

  test("q177 multi-probe LSH: recall@3 dominates single-probe recall") {
    val sfDir = "/root/testdata/sf0.001"
    val exact = graft.operators.Similarity.q45CosineTopK.fn(spark, sfDir)
      .filter(col("rank") <= 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = graft.operators.Similarity.q47AnnTopK.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = graft.operators.Similarity.q177MultiprobeTopK.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rSingle = (exact & single).size
    val rMulti = (exact & multi).size
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single $rSingle")
    assert(multi.size == 30) // every query fills its top-3 from 9 buckets
  }

  test("q178 Gopher rules: planted pass/fail docs hit the right counters") {
    val stop = graft.operators.TextOps.stopwords.take(3).mkString(" ")
    val pass = (stop + " ") + Seq.fill(60)("alpha").mkString(" ") // 63 words, alpha, stops
    val shortDoc = "too few words here now"                       // fails R1 only
    val dir = docsDir(Seq((1L, pass, "en", "web"), (2L, shortDoc, "en", "web")))
    val r = graft.operators.TextOps.q178GopherRules.fn(spark, dir).collect().head
    assert(r.getLong(0) == 2L)                      // n_docs
    assert(r.getLong(1) == 1L, r.toString)          // r1: only the long doc
    assert(r.getLong(2) == 2L, r.toString)          // r2: both mean lengths in [3,10]
    assert(r.getLong(3) == 2L, r.toString)          // r3: all words alphabetic
    assert(r.getLong(5) == 1L && r.getLong(6) == 500000L, r.toString)
  }

  test("q179 lang confusion: rows reconcile and diagonal dominates") {
    val sfDir = "/root/testdata/sf0.001"
    val out = graft.operators.TextOps.q179LangConfusion.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = out.map(_._3).sum
    assert(total == graft.sources.Tables.documents(spark, sfDir).count())
    // per-lang cells sum to the lang total carried on each row
    out.groupBy(_._1).foreach { case (_, cells) =>
      assert(cells.map(_._3).sum == cells.head._4)
    }
    out.foreach { case (_, _, n, ln, ppm) => assert(ppm == n * 1000000L / ln) }
  }

  test("q154 Mann-Kendall: increasing counts give S=n(n-1)/2, constant gives 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mk").toString
    val day = 86400L * 1000000000L
    // type "click": 1,2,3,4 events on days 0..3 -> S = 6, up
    val up = for (d <- 0 until 4; k <- 0 to d)
      yield (d.toLong * 10 + k, d * day + k * 1000000000L, 1L, 1.0, "click")
    // type "view": 2 events each day -> S = 0, flat
    val flat = for (d <- 0 until 4; k <- 0 until 2)
      yield (100L + d * 10 + k, d * day + k * 1000000000L, 1L, 1.0, "view")
    (up ++ flat).toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AuditOps.q154MkTrend.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got("click") == ((4L, 6L, "up")))
    assert(got("view") == ((4L, 0L, "flat")))
  }
}
