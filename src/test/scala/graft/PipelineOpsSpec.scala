package graft

import graft.operators.{CorpusOps, PipelineOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the second-wave pipeline operators (q92-q97) that
  * the oracle hash can't express directly: Bloom-superset semantics,
  * exact-bits surprisal, fixed-point rate normalization, centroid
  * parity with the naive float mean.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("q92 JSON extraction: per-type sums reconcile with a raw parse") {
    val out = PipelineOps.q92PropsExtract.fn(spark, sfDir)
    val total = out.agg(sum("k_sum")).as[Long].head()
    val raw = graft.sources.Tables.events(spark, sfDir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum("k")).as[Long].head()
    assert(total == raw)
    assert(out.filter(col("k_min") > col("k_max")).isEmpty)
  }

  test("q93 chunk dedup: chunk count is ceil(words/4), kept <= total") {
    val out = PipelineOps.q93ChunkDedup.fn(spark, sfDir)
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        ceil(size(split(col("text"), " ")) / 4.0).cast("long").as("expect"))
    val bad = out.join(docs, "doc_id")
      .filter(col("n_chunks") =!= col("expect") ||
        col("n_kept") > col("n_chunks") || col("n_kept") < 0)
    assert(bad.isEmpty)
  }

  test("q94 bloom probe has no false negatives vs the exact q77 probe") {
    val bloom = PipelineOps.q94BloomContamination.fn(spark, sfDir)
      .select(col("doc_id"), col("n_bloom"))
    val exact = CorpusOps.q77Contamination.fn(spark, sfDir)
      .select(col("doc_id"), col("n_hit"))
    // every exactly-contaminated doc appears with at least as many
    // bloom hits (bloom can only over-report)
    val missed = exact.join(bloom, Seq("doc_id"), "left")
      .filter(col("n_bloom").isNull || col("n_bloom") < col("n_hit"))
    assert(missed.isEmpty)
  }

  test("q95 surprisal bits = floor(log2(total div cnt)), exactly") {
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = toks.count()
    val rows = vocab.select(col("cnt")).as[Long].collect()
    rows.foreach { cnt =>
      val bits = 63 - java.lang.Long.numberOfLeadingZeros(total / cnt)
      val viaBin = java.lang.Long.toBinaryString(total / cnt).length - 1
      assert(bits == viaBin)
    }
    // and the per-doc average is bounded by the max single-token bits
    val out = PipelineOps.q95SurprisalBits.fn(spark, sfDir)
    val maxBits = java.lang.Long.toBinaryString(total).length - 1
    assert(out.filter(col("avg_bits") > maxBits || col("avg_bits") < 0).isEmpty)
  }

  test("q232 DSIR weights: pure-Scala recount of the integer LLR ranking") {
    val docRows = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
    val toks = docRows.flatMap(r =>
      r.getString(2).split(" ").map(t => (r.getLong(0), r.getString(1), t)))
    val cAll = toks.groupBy(_._3).map { case (t, xs) => t -> xs.length.toLong }
    val cTgt = toks.filter(_._2 == "en").groupBy(_._3)
      .map { case (t, xs) => t -> xs.length.toLong }
    val tAll = cAll.values.sum
    val tTgt = cTgt.values.sum
    val nv = cAll.size.toLong
    def bl(q: Long): Long = java.lang.Long.toBinaryString(q).length - 1L
    val delta = cAll.map { case (t, ca) =>
      t -> (bl((tAll + nv) / (ca + 1)) - bl((tTgt + nv) / (cTgt.getOrElse(t, 0L) + 1)))
    }
    val perDoc = toks.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.length.toLong, xs.map(x => delta(x._3)).sum))
    }
    val expect = perDoc.toSeq.sortBy { case (id, (_, w)) => (-w, id) }.take(50)
      .map { case (id, (n, w)) => (id, n, w) }
    val got = PipelineOps.q232DsirWeights.fn(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"), col("llr_bits")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // target alignment: on average, en documents outscore zh documents
    val langOf = docRows.map(r => r.getLong(0) -> r.getString(1)).toMap
    def meanW(lang: String): Double = {
      val ws = perDoc.collect { case (id, (_, w)) if langOf(id) == lang => w.toDouble }
      ws.sum / ws.size
    }
    assert(meanW("en") > meanW("zh"),
      s"DSIR target alignment broken: en ${meanW("en")} <= zh ${meanW("zh")}")
  }

  test("q96 mixture rates: ppm normalized, sampling respects the rate") {
    val out = PipelineOps.q96MixtureSample.fn(spark, sfDir)
    val ppmSum = out.agg(sum("rate_ppm")).as[Long].head()
    assert(ppmSum <= 1000000L, s"ppm sum $ppmSum")
    // integer floor division loses < n_sources ppm
    assert(ppmSum > 1000000L - out.count(), s"ppm sum $ppmSum")
    assert(out.filter(col("n_sampled") > col("n_docs")).isEmpty)
  }

  test("q98 autocorrelation r is in [-1, 1] and matches corr() closely") {
    val out = PipelineOps.q98Autocorr.fn(spark, sfDir)
    assert(out.filter(col("r") > 1.0 || col("r") < -1.0).isEmpty)
    // parity with Spark's float corr on the quantized series
    val ordered = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tn", "event_id")
    val naive = graft.sources.Tables.seriesNorm(spark, sfDir)
      .withColumn("x", round(col("value") * 1e3).cast("long"))
      .withColumn("y", lag("x", 1).over(ordered))
      .filter(col("y").isNotNull)
      .groupBy("user_id").agg(corr("x", "y").as("c"))
    val off = out.join(naive, "user_id")
      .filter(abs(col("r") - col("c")) > 1e-6)
    assert(off.isEmpty)
  }

  test("q99 funnel stages partition the users, latency only at stage 3") {
    val out = PipelineOps.q99Funnel.fn(spark, sfDir)
    val users = graft.sources.Tables.events(spark, sfDir)
      .select(countDistinct("user_id")).as[Long].head()
    assert(out.agg(sum("n_users")).as[Long].head() == users)
    assert(out.filter(col("stage") =!= 3 && col("avg_convert_sec").isNotNull).isEmpty)
    assert(out.filter(col("avg_convert_sec") < 0).isEmpty)
  }

  test("q100 repeated spans: every reported span is an exact duplicate") {
    val out = PipelineOps.q100RepeatedSpans.fn(spark, sfDir)
    // the min=max witness must hold for every group (md5 collisions
    // would show up here as exact=false)
    assert(out.filter(!col("exact")).isEmpty)
    assert(out.filter(col("n_occur") < col("n_docs") ||
      col("first_doc") > col("last_doc")).isEmpty)
  }

  test("q106 transitions: counts cover every event, starts = sessions") {
    val out = graft.operators.EventSeriesJoins.q106PathTransitions.fn(spark, sfDir)
    val events = graft.sources.Tables.events(spark, sfDir).count()
    assert(out.agg(sum("n")).as[Long].head() == events)
    val starts = out.filter(col("from_type") === "__start__")
      .agg(sum("n")).as[Long].head()
    val sessions = graft.operators.EventSeriesJoins.q30Sessionize.fn(spark, sfDir).count()
    assert(starts == sessions, s"starts=$starts sessions=$sessions")
  }

  test("q105 k-means: clusters partition the vectors, centroids in range") {
    val out = graft.operators.Similarity.q105KmeansTrain.fn(spark, sfDir)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val nVec = emb.count()
    val dims = emb.select(size(col("embedding"))).as[Int].head()
    // every cluster reports every dim; members sum to the corpus on
    // each fixed dim (the assignment is a partition)
    val perDim = out.groupBy("dim")
      .agg(sum("n_members").as("tot"), count(lit(1)).as("k"))
    assert(perDim.filter(col("tot") =!= nVec).isEmpty)
    assert(out.select(countDistinct("dim")).as[Long].head() == dims)
    // centroids bounded by the data range
    val (lo, hi) = emb.select(
        min(array_min(col("embedding"))).cast("double"),
        max(array_max(col("embedding"))).cast("double"))
      .as[(Double, Double)].head()
    assert(out.filter(col("centroid") < lo || col("centroid") > hi).isEmpty)
  }

  test("q97 centroids match the naive float mean within quantization") {
    val out = PipelineOps.q97LabelCentroids.fn(spark, sfDir)
    val naive = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim").agg(avg(col("v").cast("double")).as("m"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("m"))
    val off = out.join(naive, Seq("label", "dim"))
      .filter(abs(col("centroid") - col("m")) > 1e-5)
    assert(off.isEmpty)
    // one row per (label, dim)
    val dims = graft.sources.Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).as[Int].head()
    val labels = graft.sources.Tables.embeddings(spark, sfDir)
      .select(countDistinct("label")).as[Long].head()
    assert(out.count() == dims * labels)
  }

  test("q114 acf: five lags per series, |r| <= 1, pairs shrink with lag") {
    val out = PipelineOps.q114Acf.fn(spark, sfDir)
    assert(out.filter(abs(col("r")) > 1.0).isEmpty)
    val byUser = out.groupBy("user_id")
      .agg(countDistinct("lag").as("nl"), count(lit(1)).as("n"))
    assert(byUser.filter(col("nl") =!= 5).isEmpty)
    // n_pairs at lag L = series length - L: strictly decreasing in L
    val bad = out.as("a").join(out.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.lag") + 1 === col("b.lag"))
      .filter(col("a.n_pairs") =!= col("b.n_pairs") + 1)
    assert(bad.isEmpty)
  }

  test("q115 bigram surprisal: n_bigrams = tokens - 1, bits nonnegative") {
    val out = PipelineOps.q115BigramSurprisal.fn(spark, sfDir)
    val lens = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("want"))
    assert(out.join(lens, "doc_id").filter(col("n_bigrams") =!= col("want")).isEmpty)
    assert(out.filter(col("bits_sum") < 0).isEmpty)
    // a deterministic context always followed by the same token = 0 bits;
    // corpus-wide average must still be positive (vocabulary is mixed)
    assert(out.agg(sum("bits_sum")).as[Long].head() > 0)
  }

  test("q121 sequence packing: totals reconcile, bins contiguous per source") {
    val out = CorpusOps.q121SequencePacking.fn(spark, sfDir)
    val src = graft.sources.Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("toks"))
    // every doc lands in exactly one bin; every token is assigned
    val rolled = out.groupBy("source")
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("t"),
        min("bin").as("b0"), max("bin").as("b1"), count(lit(1)).as("nb"))
    val j = rolled.join(src, "source")
    assert(j.filter(col("d") =!= col("docs") || col("t") =!= col("toks")).isEmpty)
    // bins start at 0 and are contiguous (every bin gets a starting doc
    // only if budget >= max doc length holds loosely; allow gaps only
    // when a single doc spans multiple budgets — not in this corpus)
    assert(j.filter(col("b0") =!= 0 || col("b1") =!= col("nb") - 1).isEmpty)
    assert(out.filter(col("n_straddle") > col("n_docs")).isEmpty)
  }

  test("q116 unk mask: token counts preserved, n_masked reconciles") {
    val out = CorpusOps.q116UnkMask.fn(spark, sfDir)
    val src = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    // reassembly preserves token count
    assert(out.join(src, "doc_id")
      .filter(size(split(col("masked_text"), " ")).cast("long") =!= col("n_tok"))
      .isEmpty)
    // <unk> appears exactly n_masked times per document
    val unkCount = size(filter(split(col("masked_text"), " "),
      t => t === "<unk>")).cast("long")
    assert(out.filter(unkCount =!= col("n_masked")).isEmpty)
  }

  test("q133 chunk scrub reconciles with the q93 census; untouched docs round-trip") {
    val scrub = PipelineOps.q133ChunkScrub.fn(spark, sfDir)
    val census = PipelineOps.q93ChunkDedup.fn(spark, sfDir)
    val j = scrub.join(census, "doc_id")
    // dropped + kept = total chunks, always
    assert(j.filter(col("n_dropped") + col("n_kept") =!= col("n_chunks")).isEmpty)
    // a document with nothing dropped reassembles to its exact source text
    val src = graft.sources.Tables.documents(spark, sfDir).select("doc_id", "text")
    assert(j.filter(col("n_dropped") === 0).join(src, "doc_id")
      .filter(col("clean_text") =!= col("text")).isEmpty)
    // a fully-boilerplate document scrubs to the empty string
    assert(j.filter(col("n_kept") === 0)
      .filter(col("clean_text") =!= lit("")).isEmpty)
  }

  test("q140 OHLC bars: known open/high/low/close per 6h bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ohlc").toString
    // user 1: three events inside bar 0 (hours 0,1,2), one in bar 1 (hour 7)
    Seq((0L, 0L, 5.0), (1L, 1L, 9.0), (2L, 2L, 2.0), (3L, 7L, 4.0))
      .map { case (id, h, v) => (id, h * 3600L * 1000000000L, 1L, v, "click") }
      .toDF("event_id", "ts", "user_id", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventSeriesJoins.q140OhlcBars.fn(spark, dir)
      .select("bar", "n", "open", "high", "low", "close").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toList
    assert(got == List((0L, 3L, 5.0, 9.0, 2.0, 2.0), (1L, 1L, 4.0, 4.0, 4.0, 4.0)))
  }

  test("q141 feature hashing: dims bounded, L1 mass equals token count") {
    val out = PipelineOps.q141FeatureHash.fn(spark, sfDir)
    assert(out.filter(col("dim") < 0 || col("dim") > 15).isEmpty)
    // sum of |v| per doc can never exceed the token count, and the
    // two are equal exactly when no opposite-sign collisions occur --
    // globally the total L1 mass is bounded by total tokens
    val l1 = out.agg(sum(abs(col("v")))).head().getLong(0)
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(l1 <= toks && l1 > 0)
  }

  test("q145 split leakage: planted train span is flagged in test, fresh text is clean") {
    import graft.functions.TextHash
    // bucket assignment is md5(doc_id)-keyed, so discover ids landing
    // in each split rather than assuming them
    val buckets = spark.range(1, 300)
      .select(col("id"), TextHash.md5Bucket(col("id"), 100L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 80 => id }.get
    val testIds = buckets.collect { case (id, b) if b >= 90 => id }.take(2).toSeq
    val span = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 words
    val dir = java.nio.file.Files.createTempDirectory("graft_leak").toString
    Seq(
      (trainId, s"prefix words here $span suffix tail words", "en", "web", 1L),
      (testIds.head, s"other opening $span closing remark", "en", "web", 1L),
      (testIds(1), "wholly original held out words that never appear in training data", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineOps.q145SplitLeakage.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the planted span leaks exactly once; the fresh doc leaks nothing
    assert(got(testIds.head)._2 == 1L, got.toString)
    assert(got(testIds(1))._2 == 0L, got.toString)
    assert(!got.contains(trainId))
  }

  test("q146 fit/apply: scores only the val split, with train-fitted parameters") {
    import graft.functions.TextHash
    val out = PipelineOps.q146FitApply.fn(spark, sfDir)
    // every scored doc is in the val bucket range [80, 90)
    val buckets = out.select(col("doc_id"),
        TextHash.md5Bucket(col("doc_id"), 100L).as("b")).collect()
    assert(buckets.nonEmpty)
    buckets.foreach(r => assert(r.getLong(1) >= 80 && r.getLong(1) < 90, r.toString))
    // q_milli agrees with the quality stage the fit consumed
    val q = graft.operators.TextOps
      .withQuality(graft.sources.Tables.documents(spark, sfDir))
      .selectExpr("doc_id", "quality_ppm div 1000 AS qm")
    assert(out.join(q, "doc_id").filter(col("q_milli") =!= col("qm")).isEmpty)
  }

  test("q131 cross-correlation: a 2-hour lead peaks at exactly r=1 at lag 2") {
    // clicks trace c(h) at hour h; views LEAD by 2h (view count at h
    // equals click count at h+2), so x_b vs y_{b-2} is an identical
    // pair sequence at lag 2 -> Pearson r exactly 1.0
    val c = Array(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L, 8L)
    val rows = (0 until 12).flatMap { h =>
      val nClicks = c(h)
      val nViews = if (h <= 9) c(h + 2) else 1L
      (0L until nClicks).map(i => (h * 100 + i, h * 3600L * 1000000000L, "click")) ++
        (0L until nViews).map(i => (h * 100 + 50 + i, h * 3600L * 1000000000L, "view"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_ccf").toString
    rows.toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = PipelineOps.q131CrossCorr.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    assert(out(2L)._1 == 10L)
    assert(out(2L)._2.contains(1.0))
    assert(out(0L)._1 == 12L)
    assert(!out(0L)._2.contains(1.0))
  }
}
