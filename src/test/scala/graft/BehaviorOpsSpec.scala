package graft

import graft.operators.{BehaviorOps, Graphs, PipelineOps, SeriesOps, SignalKernels}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture invariants of the behavioral-model operators
  * (q180-q185) that the oracle hash can't express: closed-form Kalman
  * outputs, known stationary distributions, Benford constants,
  * cascade-sensitive k-core membership, boilerplate extremes, and
  * censoring accounting.
  */
class BehaviorOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val s = SeriesOps.Series(Seq("user_id"), "tn", Seq("event_id"))

  private def seriesDf(rows: Seq[(Long, Long, Double, Double, String)]) =
    rows.toDF("user_id", "event_id", "tn", "value", "event_type")

  test("q180 kalman: constant series is a fixed point; kernel matches reference loop") {
    val const = seriesDf((0L until 8L).map(i => (1L, i, i.toDouble, 5.0, "x")))
    val out = SignalKernels.kalmanLevel(spark, const, s, "value", "level", 0.01, 1.0)
      .orderBy("event_id").select("level").as[Double].collect()
    assert(out.forall(_ == 5.0))

    val xs = Array(1.0, 4.0, 2.0, 8.0, 3.0, 3.0, 9.0)
    val noisy = seriesDf(xs.zipWithIndex.map { case (v, i) =>
      (2L, i.toLong, i.toDouble, v, "x") }.toSeq)
    val got = SignalKernels.kalmanLevel(spark, noisy, s, "value", "level", 0.01, 1.0)
      .orderBy("event_id").select("level").as[Double].collect()
    // independent replay of the predict/update recurrence
    val exp = new Array[Double](xs.length)
    exp(0) = xs(0)
    var p = 1.0
    for (i <- 1 until xs.length) {
      val pp = p + 0.01
      val k = pp / (pp + 1.0)
      exp(i) = exp(i - 1) + k * (xs(i) - exp(i - 1))
      p = (1.0 - k) * pp
    }
    assert(got.toSeq == exp.toSeq)
  }

  test("q180 kalman: gain anneals — early samples weigh more than the EWMA limit") {
    // steady-state gain for q=0.01, r=1 is ~0.0951; the first update's
    // gain is (1+0.01)/(2+0.01) ~ 0.502 — the filter must track the
    // second sample far more than steady-state EWMA would
    val xs = seriesDf(Seq((1L, 0L, 0.0, 0.0, "x"), (1L, 1L, 1.0, 1.0, "x")))
    val y1 = SignalKernels.kalmanLevel(spark, xs, s, "value", "level", 0.01, 1.0)
      .orderBy("event_id").select("level").as[Double].collect().last
    assert(y1 > 0.4 && y1 < 0.6)
  }

  test("q181 markov: deterministic 2-cycle has the uniform stationary") {
    // A -> B -> A -> B ... : P is a permutation; stationary = (1/2, 1/2)
    val rows = (0L until 20L).map(i =>
      (1L, i, i.toDouble, 0.0, if (i % 2 == 0) "A" else "B"))
    val pi = BehaviorOps.markovStationaryDf(spark, seriesDf(rows))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pi == Map("A" -> 500000L, "B" -> 500000L))
  }

  test("q181 markov: real-data stationary mass stays within integer-rounding loss") {
    val pi = BehaviorOps.q181MarkovStationary.fn(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(1))
    val total = pi.sum
    // each of the 12 iterations can lose < K ppm to integer floors
    assert(total <= 1000000L && total > 1000000L - 60L * BehaviorOps.MarkovIters)
    assert(pi.forall(_ > 0L))
  }

  test("q182 benford: expected-ppm constants and observed accounting") {
    assert(BehaviorOps.BenfordPpm.head == (1 -> 301030L))
    assert(BehaviorOps.BenfordPpm.map(_._2).sum == 1000000L) // 9 rounded logs happen to close
    // planted: values 1.0 x3, 2.0 x1 -> digits 1:3, 2:1
    val df = seriesDf(Seq((1L, 0L, 0.0, 1.0, "t"), (1L, 1L, 1.0, 1.0, "t"),
      (1L, 2L, 2.0, 1.0, "t"), (1L, 3L, 3.0, 2.0, "t")))
    val got = BehaviorOps.benfordDf(df, "value", Seq("event_type"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 3L, 750000L), (2L, 1L, 250000L)))
  }

  test("q183 kcore: peeling cascades through a pendant chain") {
    // triangle {1,2,3} + chain 3-4-5: node 4 starts at degree 2 (>= 2)
    // but falls to 1 once 5 is peeled — a plain degree filter keeps it
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = und.toDF("src", "dst")
      .union(und.map(_.swap).toDF("src", "dst"))
    val core = Graphs.kCore(edges, k = 2, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("q183 kcore on real data: members' in-core degree is >= k") {
    val out = Graphs.q183Kcore.fn(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) >= 3L))
  }

  test("q184 boilerplate: duplicated doc is all-boilerplate, unique doc is none") {
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val uniq = (1 to 12).map(i => s"u$i").mkString(" ")
    val corpus = Seq((1L, text), (2L, text), (3L, uniq))
      .toDF("doc_id", "text")
    val got = PipelineOps.boilerplateDf(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 0L))
  }

  test("q185 hazard: censored tails are at risk but never events") {
    // one user, one type, events at t=0,1,2 and a trailing 'other' event
    // at t=10: gaps 1000ms x2 complete, censored tail 8000ms
    val rows = Seq((1L, 0L, 0.0, 1.0, "a"), (1L, 1L, 1.0, 1.0, "a"),
      (1L, 2L, 2.0, 1.0, "a"), (1L, 3L, 10.0, 1.0, "b"))
    val got = BehaviorOps.hazardTableDf(seriesDf(rows))
      .filter(col("event_type") === "a")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // only dtm=1000 is an event row; at risk = 2 complete + 1 censored(8000)
    assert(got.toSeq == Seq((1000L, 3L, 2L, 666666L)))
  }

  test("q187 misra-gries: merged sketch holds every token above the guarantee bar") {
    // planted stream: 'hot' 30%, 'warm' 10%, 96 singletons — k=7 counters
    // (bar 1/8 = 12.5%) must retain 'hot' under ANY partitioning
    val words = Seq.fill(60)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 120).map(i => s"rare$i")
    val shuffled = new scala.util.Random(7).shuffle(words)
    val df = shuffled.toDF("w").repartition(7)
    val st = df.as[String]
      .select(new graft.functions.MisraGriesAgg(7).toColumn).head()
    assert(st.n == words.size)
    assert(st.counters.size <= 7)
    assert(st.counters.contains("hot"))
    // deficit bound: estimate within n/(k+1) of truth
    assert(st.counters("hot") >= 60L - words.size / 8)
  }

  test("q187 heavy hitters on real data: output is the exact over-threshold set") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Sketches.q187HeavyHitters.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = graft.sources.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
    val n = words.count()
    val exact = words.groupBy("w").count()
      .filter(col("count") * (graft.operators.Sketches.MgK + 1) > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == exact && out.nonEmpty)
  }

  test("q188 rrf: histogram rank equals rank() semantics on ties") {
    val out = graft.operators.PipelineOps.q188RrfFusion.fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // rank 1 exists for both signals; rrf recomputes from its own ranks
    assert(out.map(_.getLong(1)).min == 1L && out.map(_.getLong(2)).min == 1L)
    out.foreach { r =>
      val exp = 1000000L / (60L + r.getLong(1)) + 1000000L / (60L + r.getLong(2))
      assert(r.getLong(3) == exp)
    }
  }

  test("q189 chi-square: perfectly independent table has zero statistic") {
    // 2x2 with counts proportional to margins: 10,20 / 30,60
    val df = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(60)(("b", "y")))
      .toDF("source", "lang")
    val got = graft.operators.AuditOps.chiSquareDf(df, "source", "lang")
      .collect().map(_.getDouble(4))
    assert(got.forall(_ == 0.0))
  }

  test("q190 winsorize: clips exactly to the series' own percentile band") {
    val xs = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0)
    val df = seriesDf(xs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toDouble, v, "x") }.toSeq)
    val out = SeriesOps.winsorize(df, s, "value", "wins")
      .orderBy("event_id")
      .select("wins", "wins_clipped")
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    // p05 of milli ints = 450/1000; p95 = 58600/1000 up to the ulp of
    // the interpolation's inexact 0.95·9 position product
    assert(out.head == (0.45, true))
    assert(math.abs(out.last._1 - 58.6) < 1e-9 && out.last._2)
    assert(out.slice(1, 9).forall(!_._2))
    assert(out.map(_._1).max <= 58.6 + 1e-9 && out.map(_._1).min >= 0.45)
  }

  test("q191 ols: a planted exact line fits with r2 = 1") {
    val df = (1L to 50L).map(i => ("k", i, 3L * i + 7L))
      .toDF("source", "x", "y")
    val got = graft.operators.AuditOps.olsFitDf(df, "source", "x", "y").head()
    assert(got.getDouble(2) == 3.0 && got.getDouble(3) == 7.0 && got.getDouble(4) == 1.0)
  }

  test("q191 ols: constant x emits null fit, not a crash") {
    val df = Seq(("k", 5L, 1L), ("k", 5L, 9L)).toDF("source", "x", "y")
    val got = graft.operators.AuditOps.olsFitDf(df, "source", "x", "y").head()
    assert(got.isNullAt(2) && got.isNullAt(3) && got.isNullAt(4))
  }

  test("q192 entropy: single-minded user scores 0, uniform 2-type user 1000 millibits") {
    val out = graft.operators.BehaviorOps.q192UserEntropy
    // closed-form check via the same formula on a tiny planted frame
    val c = Seq((1L, "a", 10L), (2L, "a", 5L), (2L, "b", 5L))
      .toDF("user_id", "event_type", "c")
    val got = c.withColumn("n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .withColumn("bits", (length(bin(expr("n div c"))) - 1).cast("long"))
      .groupBy("user_id")
      .agg(expr("CAST(1000 * sum(c * bits) div max(n) AS BIGINT)").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1000L))
    assert(out.fn(spark, "/root/testdata/sf0.001").collect().forall(_.getLong(3) >= 0))
  }

  test("q193 antitonic: violating curve pools, monotone curve is untouched") {
    // rates 10%, 30%, 20% (equal weights) violate non-increase at both
    // steps; the min-max fit pools everything to the global 20% mean
    val hist = Seq((0L, 100L, 10L), (1L, 100L, 30L), (2L, 100L, 20L))
      .toDF("band", "n_docs", "n_dup")
    val got = graft.operators.AuditOps.isotonicDf(hist, "band", "n_docs", "n_dup")
      .orderBy("band").collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 100000L, 200000L),
      (1L, 300000L, 200000L), (2L, 200000L, 200000L)))
    // an already non-increasing curve is a fixed point
    val mono = Seq((0L, 100L, 30L), (1L, 100L, 20L), (2L, 100L, 10L))
      .toDF("band", "n_docs", "n_dup")
    val gotM = graft.operators.AuditOps.isotonicDf(mono, "band", "n_docs", "n_dup")
      .orderBy("band").collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(gotM.forall { case (raw, iso) => raw == iso })
  }

  test("q195 fuzzy match: pairs share a block and respect the edit bound") {
    val out = graft.operators.Relational.q195FuzzyMatch.fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a.split(" ").head == b.split(" ").head, s"cross-block pair: $a / $b")
      assert(d >= 1 && d <= 3)
      // engine-side distance agrees with an independent DP replay
      def lev(x: String, y: String): Int = {
        val dp = Array.tabulate(x.length + 1, y.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to x.length; j <- 1 to y.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        dp(x.length)(y.length)
      }
      assert(lev(a, b).toLong == d, s"distance mismatch for $a / $b")
    }
  }

  test("q196 rolling beta: an exact line has constant slope in every window") {
    // y = 2.5·i + 1 on a uniform index: beta = 2500 milli-units/step
    val rows = (0L until 40L).map(i => (1L, i, i.toDouble, 2.5 * i + 1.0, "x"))
    val out = graft.operators.EventSeries.all.find(_.name == "q196_rolling_beta").get
    val df = seriesDf(rows)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tn", "event_id")
    val got = df
      .withColumn("y", round(col("value") * 1e3).cast("long"))
      .withColumn("i", row_number().over(win).cast("long"))
      .withColumn("w", count(lit(1)).over(win.rowsBetween(-15, 0)))
      .withColumn("sx", sum("i").over(win.rowsBetween(-15, 0)))
      .withColumn("sxx", sum(col("i") * col("i")).over(win.rowsBetween(-15, 0)))
      .withColumn("sy", sum("y").over(win.rowsBetween(-15, 0)))
      .withColumn("sxy", sum(col("i") * col("y")).over(win.rowsBetween(-15, 0)))
      .withColumn("beta", expr("CAST(w * sxy - sx * sy AS DOUBLE) / (w * sxx - sx * sx)"))
      .filter(col("w") >= 2).select("beta").as[Double].collect()
    assert(got.forall(_ == 2500.0))
    assert(out.fn(spark, "/root/testdata/sf0.001").count() > 0)
  }

  test("q197 ahash: identical payloads land in one duplicate cluster") {
    val out = graft.operators.Multimodal.q197MediaAhash.fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // every member's group agrees with its canonical (min doc) and size >= 2
    out.groupBy(_.getLong(1)).values.foreach { g =>
      assert(g.length == g.head.getLong(2))
      assert(g.map(_.getLong(0)).min == g.head.getLong(3))
    }
  }

  test("q198 breakpoint: a clean level shift is found with zero two-piece SSE") {
    // flat 0 for 10 rows then flat 100: the split after row 10 fits
    // both halves exactly; every other split leaves residue
    val rows = (1L to 20L).map(i =>
      (1L, i, i.toDouble, if (i <= 10) 0.0 else 100.0, "x"))
    val got = graft.operators.EventSeries.all.find(_.name == "q198_breakpoint").get
    val dirQ = got // declared query runs on real data below
    val out = applyBreakpoint(seriesDf(rows))
    assert(out == Seq((1L, 10L, 0.0)))
    val real = dirQ.fn(spark, "/root/testdata/sf0.001").collect()
    assert(real.nonEmpty && real.forall(_.getDouble(3) >= 0.0))
  }

  private def applyBreakpoint(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = {
    // replicate the q198 pipeline on an in-memory frame (the QueryDef
    // reads parquet; the math is identical by construction)
    import org.apache.spark.sql.expressions.Window
    val ow = Window.partitionBy("user_id").orderBy("tn", "event_id")
    val pw = ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val uw = Window.partitionBy("user_id")
    val p = df
      .withColumn("y", round(col("value") * 1e3).cast("long"))
      .withColumn("i", row_number().over(ow).cast("long"))
      .withColumn("csx", sum("i").over(pw)).withColumn("csxx", sum(expr("i*i")).over(pw))
      .withColumn("csy", sum("y").over(pw)).withColumn("csyy", sum(expr("y*y")).over(pw))
      .withColumn("csxy", sum(expr("i*y")).over(pw))
      .withColumn("n", count(lit(1)).over(uw))
      .withColumn("tx", sum("i").over(uw)).withColumn("txx", sum(expr("i*i")).over(uw))
      .withColumn("ty", sum("y").over(uw)).withColumn("tyy", sum(expr("y*y")).over(uw))
      .withColumn("txy", sum(expr("i*y")).over(uw))
    val e = p.filter(col("i") >= 2 && col("i") <= col("n") - 2)
      .withColumn("sse",
        expr("""(CAST(i*csyy - csy*csy AS DOUBLE) * (i*csxx - csx*csx)
               - CAST(i*csxy - csx*csy AS DOUBLE) * (i*csxy - csx*csy))
               / (CAST(i AS DOUBLE) * (i*csxx - csx*csx))""") +
        expr("""(CAST((n-i)*(tyy-csyy) - (ty-csy)*(ty-csy) AS DOUBLE) * ((n-i)*(txx-csxx) - (tx-csx)*(tx-csx))
               - CAST((n-i)*(txy-csxy) - (tx-csx)*(ty-csy) AS DOUBLE) * ((n-i)*(txy-csxy) - (tx-csx)*(ty-csy)))
               / (CAST(n-i AS DOUBLE) * ((n-i)*(txx-csxx) - (tx-csx)*(tx-csx)))"""))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("sse"), col("i"))))
      .filter(col("rn") === 1)
    e.select("user_id", "i", "sse").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("q199 welch: planted two-sample case matches the closed form") {
    // a = {1, 3}: mean 2000 milli, vm = 1e6; b = {5, 7}: mean 6000, vm = 1e6
    // t = -4000/sqrt(2e6) = -2.828427..; df = (2e6)^2 / (2 * 1e12) = 2
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0))
      .toDF("g", "v")
    val got = graft.operators.BehaviorOps.welchDf(df, "g", "v").head()
    assert(got.getString(0) == "a" && got.getString(1) == "b")
    assert(math.abs(got.getDouble(4) - -2.828427) < 1e-6)
    assert(got.getDouble(5) == 2.0)
  }

  test("q199 welch on real data: all 10 type pairs, df within classic bounds") {
    val out = graft.operators.BehaviorOps.q199WelchTtest.fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (na, nb, dfw) = (r.getLong(2), r.getLong(3), r.getDouble(5))
      assert(dfw >= math.min(na, nb) - 1 && dfw <= na + nb - 2)
    }
  }

  test("q200 silhouette: ppm scores stay in [-1e6, 1e6] and clusters cohere") {
    val out = graft.operators.Similarity.q200Silhouette.fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getLong(2) >= -1000000L && r.getLong(2) <= 1000000L))
    // k-means labels on clustered embeddings: most points closer to
    // their own centroid than to any other
    assert(out.count(_.getLong(2) > 0) > out.length / 2)
  }

  test("q201 simpson: closed forms on planted vocabularies") {
    val out = graft.operators.TextOps.q201SimpsonDiversity
    // all-repeat source: D = 1; half-half source: D = 4/12
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("graft_simpson").toString
      Seq((1L, "x x x x", "en", "rep", 7L), (2L, "a a b b", "en", "mix", 7L),
        (3L, "p q r s", "en", "uniq", 7L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val got = out.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(got("rep") == ((1.0, 1.0)))
    assert(got("mix") == ((0.333333, 3.0)))
    assert(!got.contains("uniq")) // rep = 0: no repeat probability to report
  }

  test("q202 gini: equal values score 0, a single whale concentrates") {
    val eq = Seq(("t", 5.0), ("t", 5.0), ("t", 5.0), ("t", 5.0)).toDF("k", "v")
    assert(graft.operators.BehaviorOps.giniDf(eq, "k", "v")
      .head().getLong(2) == 0L)
    // values 0,0,0,x: numerator 3x, denominator 4x -> 750000 ppm
    val whale = Seq(("t", 0.0), ("t", 0.0), ("t", 0.0), ("t", 8.0)).toDF("k", "v")
    assert(graft.operators.BehaviorOps.giniDf(whale, "k", "v")
      .head().getLong(2) == 750000L)
  }

  test("q203 quantile normalize: pooled-range bound and within-source monotonicity") {
    val out = graft.operators.PipelineOps.q203QuantileNormalize
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val (qmin, qmax) = (out.map(_._2).min.toDouble, out.map(_._2).max.toDouble)
    assert(out.forall(r => r._3 >= qmin && r._3 <= qmax))
    out.groupBy(_._1).values.foreach { src =>
      val sorted = src.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._3 <= b._3, s"qnorm not monotone in qp for ${a._1}")
      }
    }
  }

  test("q204 ece: the rollup reproduces from its own band rows") {
    val rows = graft.operators.AuditOps.q204Ece.fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    val weighted = rows.map(r => r.getLong(1) * r.getLong(4)).sum
    rows.foreach { r =>
      assert(r.getLong(4) == math.abs(r.getLong(3) - r.getLong(2)))
      assert(r.getLong(5) == weighted / n)
    }
  }

  test("q205 assoc rules: margins close and lift reproduces from counts") {
    val rows = graft.operators.BehaviorOps.q205AssocRules
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 25)
    val nn = rows.map(_.getLong(2)).sum
    // support floors lose < 1 ppm per rule
    val supportSum = rows.map(_.getLong(3)).sum
    assert(supportSum <= 1000000L && supportSum > 1000000L - rows.length)
    // per-rule lift recomputed from the margins
    val nf = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val nt = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    rows.foreach { r =>
      val exp = 1000000L * r.getLong(2) * nn / (nf(r.getString(0)) * nt(r.getString(1)))
      assert(r.getLong(5) == exp)
      assert(r.getLong(4) == 1000000L * r.getLong(2) / nf(r.getString(0)))
    }
  }

  test("q206 attribution: a mandatory channel owns 100% removal effect") {
    // every conversion path is __start__ -> click -> purchase, so
    // removing click kills all conversions
    val rows = Seq((1L, 0L, 0.0, 1.0, "click"), (1L, 1L, 1.0, 1.0, "purchase"),
      (2L, 2L, 0.0, 1.0, "click"), (2L, 3L, 1.0, 1.0, "purchase"))
    val got = graft.operators.BehaviorOps
      .markovAttributionDf(spark, seriesDf(rows), Seq("click", "view"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got("click") == ((1000000L, 1000000L)))
    assert(got("view")._2 == 0L) // absent channel removes nothing
  }

  test("q206 attribution on real data: effects within [0, 1e6], shared base") {
    val rows = graft.operators.BehaviorOps.q206MarkovAttribution
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(1)).distinct.length == 1) // one base probability
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
      assert(r.getLong(2) <= r.getLong(1)) // removing a channel never helps
    }
  }

  test("q207 scd2: versions chain and only the last is open") {
    val rows = Seq((1L, 0L, 0.0, 1.0, "A"), (1L, 1L, 1.0, 1.0, "A"),
      (1L, 2L, 2.0, 1.0, "B"), (1L, 3L, 3.0, 1.0, "A"))
    val dirDf = seriesDf(rows)
    // replicate through the declared query path on real data; planted
    // path goes through the same windows inline
    import org.apache.spark.sql.expressions.Window
    val ow = Window.partitionBy("user_id").orderBy("tn", "event_id")
    val lagType = lag(col("event_type"), 1).over(ow)
    val r = dirDf
      .withColumn("chg", when(lagType.isNull || lagType =!= col("event_type"), 1).otherwise(0))
      .withColumn("version", sum("chg").over(
        ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"), col("event_type").as("state"))
      .agg(min("tn").as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(Window.partitionBy("user_id").orderBy("version")))
      .orderBy("version")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getDouble(3),
        Option(r.get(5)).map(_.asInstanceOf[Double]), r.getLong(4)))
    assert(r.toSeq == Seq(
      (1L, "A", 0.0, Some(2.0), 2L),
      (2L, "B", 2.0, Some(3.0), 1L),
      (3L, "A", 3.0, None, 1L)))
    // real data: contiguous versions, exactly one open interval per user
    val real = graft.operators.BehaviorOps.q207Scd2History
      .fn(spark, "/root/testdata/sf0.001").collect()
    real.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.count(_.getBoolean(5)) == 1)
      assert(g.map(_.getLong(1)).sorted.toSeq == (1L to g.length).toSeq)
    }
  }

  test("q209 linkage clusters: transitive closure and canonical accounting") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.operators.Relational.q195FuzzyMatch.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val clusters = graft.operators.Relational.q209LinkageClusters.fn(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
    val canon = clusters.map { case (n, (c, _, _)) => n -> c }.toMap
    // every matched pair resolved to one entity
    pairs.foreach { case (a, b) => assert(canon(a) == canon(b), s"$a / $b split") }
    // canonical is the cluster's lexicographic minimum; parts sum up
    clusters.groupBy(_._2._1).foreach { case (c, members) =>
      assert(members.map(_._1).min == c)
      val total = members.map(_._2._2).sum
      members.foreach { case (_, (_, _, cp)) => assert(cp == total) }
    }
  }

  test("q210 zipf: natural-ish corpus fits a negative log-log slope") {
    val row = graft.operators.TextOps.q210ZipfFit.fn(spark, "/root/testdata/sf0.001")
      .head()
    assert(row.getLong(0) > 0)
    assert(row.getDouble(1) < 0.0) // frequency falls with rank
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  test("q211 haar: alternating series is pure level-1 energy; constants are silent") {
    // +1/-1 alternation: every level-1 block differs by 2 (milli 2000),
    // every higher-level detail cancels exactly
    val alt = (0L until 32L).map(i =>
      (1L, i, i.toDouble, if (i % 2 == 0) 1.0 else -1.0, "x"))
    val const = (0L until 32L).map(i => (2L, 100 + i, i.toDouble, 7.0, "x"))
    val q = graft.operators.EventSeries.all.find(_.name == "q211_haar_energy").get
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("graft_haar").toString
      // route through the real query path: fabricate an events table
      (alt ++ const).map { case (u, e, tn, v, tp) =>
        (e, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(86400L + tn.toLong)), u, tp, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    val got = q.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // user 1: level 1 = 16 blocks x (2000)^2; levels 2..5 cancel to 0
    assert(got((1L, 1L)) == ((16L, 16L * 4000000L)))
    (2 to 5).foreach(l => assert(got((1L, l.toLong))._2 == 0L))
    // constant series: every detail is 0 at every level
    (1 to 5).foreach(l => assert(got((2L, l.toLong))._2 == 0L))
  }

  test("q213 bootstrap: interval brackets the full-sample mean and is ordered") {
    val out = graft.operators.BehaviorOps.q213BootstrapCi
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 5)
    val means = graft.sources.Tables.series(spark, "/root/testdata/sf0.001")
      .groupBy("event_type")
      .agg(expr("CAST(sum(CAST(round(value * 1000.0) AS BIGINT)) AS DOUBLE)" +
        " / count(1) / 1000.0").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val (lo, mid, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(r.getLong(1) == graft.operators.BehaviorOps.BootstrapReps)
      assert(lo <= mid && mid <= hi)
      // half-sample replicate means hug the full mean at these n
      val m = means(r.getString(0))
      assert(lo <= m + 0.5 && hi >= m - 0.5, s"interval [$lo,$hi] far from mean $m")
    }
  }

  test("q214 cuped: one-row fit with reduction in [0,1]") {
    val r = graft.operators.BehaviorOps.q214Cuped.fn(spark, "/root/testdata/sf0.001")
      .head()
    assert(r.getLong(0) > 0 && r.getLong(0) <= 15)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("q215 trimmed mean: matches an independent sort-and-trim replay") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.BehaviorOps.q215TrimmedMean.fn(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val byType = graft.sources.Tables.series(spark, dir)
      .select(col("event_type"), expr("CAST(round(value * 1000.0) AS BIGINT)").as("v"))
      .collect().groupBy(_.getString(0))
    byType.foreach { case (tpe, rows) =>
      val vs = rows.map(_.getLong(1)).sorted
      val n = vs.length
      val k = n * 5 / 100
      val kept = vs.slice(k, n - k)
      val exp = BigDecimal(kept.sum.toDouble / kept.length / 1000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gk, gm) = got(tpe)
      assert(gn == n && gk == k)
      assert(math.abs(gm - exp) < 1e-9, s"$tpe: $gm vs $exp")
    }
  }

  test("q216 negative pairs: deterministic, existing, non-self") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.operators.CorpusOps.q216NegativePairs
    val a = q.fn(spark, dir).collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
    val b = q.fn(spark, dir).collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
    assert(a.toSeq == b.toSeq) // no RNG anywhere
    val ids = graft.sources.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    a.foreach { case (_, neg, anchor) =>
      assert(ids.contains(neg) && neg != anchor)
    }
    assert(a.length >= ids.size) // ~2 pairs per doc minus self-collisions
  }

  test("q217 waterfill: allocations respect caps, share a level, spend the budget") {
    val rows = graft.operators.CorpusOps.q217MixtureWaterfill
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getLong(3)))
    val totalCap = rows.map(_._1).sum
    val budget = totalCap / 2
    rows.foreach { case (cap, whole, alloc) =>
      assert(alloc <= cap)
      if (whole) assert(alloc == cap)
    }
    val levels = rows.filter(!_._2).map(_._3).distinct
    assert(levels.length <= 1) // every non-whole source fills to one level
    val spent = rows.map(_._3).sum
    assert(spent <= budget && budget - spent < rows.length.toLong *
      (levels.headOption.getOrElse(0L) + 1)) // only floor remainder unspent
  }

  test("q218 table diff: statuses match the simulated edit exactly") {
    val out = graft.operators.CorpusOps.q218TableDiff.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      if (id % 13 == 0) assert(out(id) == "removed")
      else if (id % 7 == 0) assert(out(id) == "changed")
      else assert(!out.contains(id))
    }
    assert(!out.values.exists(_ == "same") && !out.values.exists(_ == "added"))
  }

  test("q219 quantile trend: p50 <= p90 everywhere, cells partition the events") {
    val out = graft.operators.PipelineOps.q219QuantileTrend
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(3) <= r.getDouble(4)))
    val total = out.map(_.getLong(2)).sum
    assert(total == graft.sources.Tables.events(spark, "/root/testdata/sf0.001").count())
  }

  test("q220 embedding health: 64 dims, variance non-negative, moments consistent") {
    val out = graft.operators.Similarity.q220EmbeddingHealth
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 64)
    val n = out.head.getLong(1)
    out.foreach { r =>
      assert(r.getLong(1) == n) // rectangular embedding matrix
      assert(r.getDouble(4) >= 0.0)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= n)
    }
  }

  test("q222 cluster sizes: ppm shares close and sizes are >= 2") {
    val out = graft.operators.Dedup.q222ClusterSizes.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (size, nc, _) => assert(size >= 2 && nc >= 1) }
    val ppm = out.map(_._3).sum
    assert(ppm <= 1000000L && ppm > 1000000L - out.length)
  }

  test("q223 trigrams: counts ordered, triples reproduce from raw leads") {
    val out = graft.operators.BehaviorOps.q223TrigramPaths.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.length == 20)
    out.zip(out.tail).foreach { case (a, b) => assert(a._4 >= b._4) }
    // spot-check the top triple's count against an independent scan
    val (t1, t2, t3, n) = out.head
    val s0 = graft.sources.Tables.series(spark, "/root/testdata/sf0.001")
      .orderBy("user_id", "t", "event_id")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cnt = s0.sliding(3).count {
      case Array((u1, a), (u2, b), (u3, c)) =>
        u1 == u2 && u2 == u3 && a == t1 && b == t2 && c == t3
      case _ => false
    }
    assert(cnt.toLong == n)
  }

  test("q224 dim redundancy: correlations bounded, ordered by |r|, pairs ordered") {
    val out = graft.operators.Similarity.q224DimRedundancy
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 20)
    out.foreach { case (i, j, r) =>
      assert(i < j && r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    }
    val absR = out.map(t => math.abs(t._3))
    absR.zip(absR.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("q221 share drift: weekly shares close to 1e6, drifts telescope") {
    val out = graft.operators.BehaviorOps.q221ShareDrift
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.nonEmpty)
    out.groupBy(_._2).values.foreach { wk =>
      val share = wk.map(_._3).sum
      assert(share <= 1000000L && share > 1000000L - wk.length)
    }
    // each type's drifts sum to last share − first share
    out.groupBy(_._1).values.foreach { tp =>
      val ordered = tp.sortBy(_._2)
      assert(ordered.head._4.isEmpty)
      val total = ordered.flatMap(_._4).sum
      assert(total == ordered.last._3 - ordered.head._3)
    }
  }

  test("q225 fold stability: five leave-one-out fits, train sizes telescope") {
    val out = graft.operators.AuditOps.q225FoldStability
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 5)
    val total = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").count()
    // each row trains on the complement: sizes sum to 4x the corpus
    assert(out.map(_.getLong(1)).sum == 4 * total)
    out.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("q227 bm25: scores ordered, positive, and tf-saturating") {
    val out = graft.operators.TextOps.q227Bm25TopK.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 10)
    out.zip(out.tail).foreach { case (a, b) => assert(a._2 >= b._2) }
    assert(out.forall(_._2 > 0))
    // saturation: the top score is bounded by 3 terms x idf x (k1+1)
    val nDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").count()
    val maxIdf = nDocs * 1000 // df >= 1
    assert(out.head._2 <= 3L * maxIdf * 1000000L * 22 / 10)
  }

  test("q185 hazard: at-risk counts are non-increasing in duration per type") {
    val out = BehaviorOps.q185HazardTable.fn(spark, "/root/testdata/sf0.001").collect()
    val byType = out.groupBy(_.getString(0))
    byType.values.foreach { rows =>
      val atRisk = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(atRisk.zip(atRisk.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q228 fertility: per-lang sums reproduce from an independent doc scan") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.TextOps.q228TokenFertility.fn(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.nonEmpty)
    val raw = graft.sources.Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .groupBy(_.getString(0)).map { case (l, rs) =>
        val toks = rs.map(_.getString(1).split(" ", -1).length.toLong).sum
        val chars = rs.map(_.getString(1).length.toLong).sum
        l -> (rs.length.toLong, toks, chars)
      }
    assert(out.keySet == raw.keySet)
    raw.foreach { case (l, (nd, toks, chars)) =>
      val (ond, otoks, ochars, cpt, fert, tpd) = out(l)
      assert(ond == nd && otoks == toks && ochars == chars)
      assert(cpt == 1000000L * chars / toks)
      assert(tpd == toks / nd)
      // word-salad text: subword tokens >= whitespace tokens, so
      // fertility is at least 1.0 (1e6 ppm)
      assert(fert >= 1000000L)
    }
  }

  test("q229 oov curve: cumulative columns telescope and close at full coverage") {
    val rows = graft.operators.CorpusOps.q229OovCurve.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length >= 3)
    // ordered by freq desc; vocab_size/occ_cum telescope over n_tokens
    rows.zip(rows.tail).foreach { case ((f1, _, v1, o1, c1), (f2, n2, v2, o2, c2)) =>
      assert(f1 > f2 && v2 == v1 + n2 && o2 == o1 + f2 * n2 && c2 >= c1)
    }
    assert(rows.head._3 == rows.head._2)
    assert(rows.last._5 == 1000000L) // last row covers every occurrence
  }

  test("q231 dedup quality shift: kept+dropped closes per source, dropped are non-canonical members") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.operators.Dedup.q231DedupQualityShift.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(rows.nonEmpty)
    val perSource = graft.sources.Tables.documents(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, k, d, kq, dq, sh) =>
      assert(k + d == perSource(src), s"$src kept+dropped != total")
      kq.foreach(q => assert(q >= 0 && q <= 1000000L))
      dq.foreach(q => assert(q >= 0 && q <= 1000000L))
      (kq, dq, sh) match {
        case (Some(a), Some(b), Some(s)) => assert(s == a - b)
        case (_, None, None) | (None, _, None) => ()
        case other => fail(s"inconsistent null pattern: $other")
      }
    }
    // total dropped = total cluster members - number of clusters
    val canon = graft.operators.Dedup.q80ClusterCanonical.fn(spark, dir)
      .collect().map(r => r.getLong(2)).toSeq
    assert(rows.map(_._3).sum == canon.sum - canon.length)
  }

  test("q155 cells: an oversize IVF list splits and keeps one canonical per cell") {
    // 1200 identical vectors all land in ONE IVF list — the profile
    // that made the unsplit pair scan quadratic. With the
    // SemDedupCellTarget=512 sub-split the list becomes B=3 md5
    // cells; each cell's minimum vec_id survives as canonical, so
    // kept == B and every other vector is pruned by a same-cell
    // lower id.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    val n = 1200
    (0 until n).map(i => (i.toLong, Array.fill(8)(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    val out = graft.operators.Similarity.q155SemdedupPrune.fn(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(out.length == n)
    val b = (n + graft.operators.Similarity.SemDedupCellTarget - 1) /
      graft.operators.Similarity.SemDedupCellTarget
    assert(b == 3)
    val cellOf = (0 until n).map(i => (i.toLong,
      graft.functions.TextHash.base32Builtin(lit(i.toLong).cast("string")) % b))
    val cells = spark.range(1).select(cellOf.map(_._2): _*).head()
      .toSeq.asInstanceOf[Seq[Long]].zipWithIndex.map { case (c, i) => i.toLong -> c }.toMap
    val expectedKept = cells.groupBy(_._2).values.map(_.keys.min).toSet
    val kept = out.filter(_._3).map(_._1).toSet
    assert(kept == expectedKept, s"kept $kept != per-cell minima $expectedKept")
    // pruned vectors report at least one close lower-id neighbor
    out.filterNot(_._3).foreach { case (_, nClose, _) => assert(nClose >= 1) }
  }

  test("q230 minhash calibration: deciles bounded, bias column consistent") {
    val rows = graft.operators.Dedup.q230MinhashCalibration.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (dec, n, jac, sig, bias) =>
      assert(dec >= 0 && dec <= 10 && n >= 1)
      assert(jac >= 0 && jac <= 1000000L && sig >= 0 && sig <= 1000000L)
      assert(bias == sig - jac)
      // decile bucket brackets its mean exact Jaccard (truncating
      // integer deciles: mean of values in [dec/10, (dec+1)/10))
      assert(jac >= dec * 100000L - 1 && (dec == 10 || jac < (dec + 1) * 100000L))
    }
  }

  test("q233 k-anonymity: census reconciles with a pure-Scala profile recount") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000000000 div 86400").as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def bl(q: Long): Int = java.lang.Long.toBinaryString(q).length - 1
    // one quasi-identifier tuple per user, modal tie-break (c desc, type asc)
    val profiles = ev.groupBy(_._1).values.map { xs =>
      val top = xs.groupBy(_._2).map { case (t, ys) => (t, ys.length) }
        .toSeq.sortBy { case (t, c) => (-c, t) }.head._1
      (top, bl(xs.length.toLong), bl(xs.map(_._3).distinct.length.toLong))
    }.toSeq
    val census = profiles.groupBy(identity).values.map(_.size.toLong)
      .groupBy(identity).map { case (k, cs) => k -> cs.size.toLong }
    val got = BehaviorOps.q233KAnonymity.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.map(_._1).toSeq == census.keys.toSeq.sorted, "class sizes")
    got.foreach { case (k, nc, nu, risk) =>
      assert(nc == census(k), s"k=$k classes")
      assert(nu == k * nc, s"k=$k user count closure")
      assert(risk == (if (k < 5) 1 else 0), s"k=$k risk flag")
    }
    // every user lands in exactly one class
    assert(got.map(_._3).sum == profiles.size.toLong)
  }
}
