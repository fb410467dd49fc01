package graft.operators

import graft.QueryDef
import graft.functions.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedDataset

/** Corpus- and stream-audit operators: the diagnostics a training-data
  * pipeline runs BEFORE committing to a mixture — collocation mining,
  * dedup saturation (how much of the next ingest tranche is new?),
  * per-document novelty, cross-source span contamination, and
  * monotonic-trend detection on event cadence.
  *
  * Determinism policy matches [[PipelineOps]]: every hashed output is
  * an exact integer computation (counts, integer `div` fixed-point
  * ppm) or a round of an order-insensitive integer sum, so the DuckDB
  * oracle hash cannot drift on parallel reduction order.
  */
object AuditOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.documents(spark, dir)

  // ------------------------------------------------------------------
  // q150: collocation mining (PMI-style lift)
  // ------------------------------------------------------------------

  /** Bigram collocation lift: `lift = P(w1 w2) / (P(w1)·P(w2))` in
    * exact integer ppm — `c_xy · N · 10^6 div (c_x · c_y)` where N is
    * the corpus bigram-token total. The phrase-mining signal behind
    * tokenizer merges and stop-phrase lists.
    *
    * Scale shape: one explode → hash aggregate per relation (bigram
    * counts, unigram counts) with map-side combine, both keyed on
    * vocabulary terms (bounded by the language, not the corpus); the
    * two enrichment joins are vocab-keyed hash joins; N rides in as a
    * broadcast 1-row cross join. Top-100 is TakeOrderedAndProject.
    * No self-joins, no pair explosion.
    */
  val q150CollocationLift: QueryDef = QueryDef.sql(
    "q150_collocation_lift",
    """WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1])) AS b FROM ws),
      |bc AS (SELECT b, count(*) AS n_pair FROM bg GROUP BY b),
      |uc AS (SELECT wd, count(*) AS n
      |  FROM (SELECT unnest(w) AS wd FROM ws) GROUP BY wd),
      |tot AS (SELECT CAST(sum(n_pair) AS BIGINT) AS n_total FROM bc)
      |SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
      |  n_pair, u1.n AS n_w1, u2.n AS n_w2,
      |  (n_pair * 1000000 * n_total) // (u1.n * u2.n) AS lift_ppm
      |FROM bc, tot
      |JOIN uc u1 ON split_part(b, ' ', 1) = u1.wd
      |JOIN uc u2 ON split_part(b, ' ', 2) = u2.wd
      |WHERE n_pair >= 5
      |ORDER BY lift_ppm DESC, w1, w2 LIMIT 100""".stripMargin) { (spark, dir) =>
    collocationLiftDf(docs(spark, dir))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(100)
  }

  /** The q150 collocation stage as a reusable corpus transform (also
    * the `Corpus.collocationLift` facade).
    */
  def collocationLiftDf(corpus: DataFrame, minPair: Long = 5): DataFrame = {
    val ws = corpus.select(split(col("text"), " ").as("w"))
    val bigrams = ws
      .select(explode(TextHash.shinglesFromWords(col("w"), 2)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .withColumn("w2", substring_index(col("b"), " ", -1))
    val unigrams = ws.select(explode(col("w")).as("wd"))
      .groupBy("wd").agg(count(lit(1)).as("n"))
    // N must count ALL bigrams, not just the n_pair>=minPair
    // survivors: the filter above is pushed below the total on the
    // Spark side too by summing over a separate unfiltered aggregate.
    val total = ws
      .select(explode(TextHash.shinglesFromWords(col("w"), 2)).as("b"))
      .agg(count(lit(1)).as("n_total"))
    bigrams
      .join(unigrams.withColumnRenamed("wd", "w1").withColumnRenamed("n", "n_w1"), Seq("w1"))
      .join(unigrams.withColumnRenamed("wd", "w2").withColumnRenamed("n", "n_w2"), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("lift_ppm", expr("n_pair * 1000000L * n_total div (n_w1 * n_w2)"))
      .select("w1", "w2", "n_pair", "n_w1", "n_w2", "lift_ppm")
  }

  // ------------------------------------------------------------------
  // q151: dedup saturation curve
  // ------------------------------------------------------------------

  /** Dedup saturation: split the corpus into 10 deterministic ingest
    * tranches (md5 bucket of doc_id) and report, per cumulative
    * prefix, how many content hashes are NEW — the yield curve that
    * answers "is the next crawl tranche still worth deduping in?".
    *
    * Scale shape: each content hash contributes one row to a
    * `min(bucket)` hash aggregate (its first-seen tranche), bucket
    * row totals are a second map-side-combined aggregate, and the
    * cumulative prefix sums run on the 10-row bucket table — the
    * whole curve costs two aggregates regardless of corpus size.
    */
  val q151DedupSaturation: QueryDef = QueryDef.sql(
    "q151_dedup_saturation",
    s"""WITH d AS (SELECT ${TextHash.duckMd5Bucket("doc_id", 10)} AS bucket,
       |    md5(text) AS h FROM documents),
       |rows_b AS (SELECT bucket, count(*) AS n_rows FROM d GROUP BY bucket),
       |first_b AS (SELECT min(bucket) AS fb FROM d GROUP BY h),
       |new_b AS (SELECT fb AS bucket, count(*) AS n_new FROM first_b GROUP BY fb),
       |curve AS (SELECT r.bucket, r.n_rows, coalesce(n.n_new, 0) AS n_new
       |  FROM rows_b r LEFT JOIN new_b n ON r.bucket = n.bucket)
       |SELECT bucket,
       |  CAST(sum(n_rows) OVER w AS BIGINT) AS rows_cum,
       |  CAST(sum(n_new) OVER w AS BIGINT) AS distinct_cum,
       |  CAST(((sum(n_rows) OVER w - sum(n_new) OVER w) * 1000000)
       |    // (sum(n_rows) OVER w) AS BIGINT) AS dup_ppm
       |FROM curve
       |WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY bucket""".stripMargin) { (spark, dir) =>
    dedupSaturationDf(docs(spark, dir)).orderBy("bucket")
  }

  /** The q151 saturation curve as a reusable corpus transform (also
    * the `Corpus.dedupSaturation` facade).
    */
  def dedupSaturationDf(corpus: DataFrame, buckets: Long = 10): DataFrame = {
    val d = corpus.select(
      TextHash.md5Bucket(col("doc_id"), buckets).as("bucket"), md5(col("text")).as("h"))
    val rowsB = d.groupBy("bucket").agg(count(lit(1)).as("n_rows"))
    val newB = d.groupBy("h").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rowsB.join(newB, Seq("bucket"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("rows_cum", sum("n_rows").over(w))
      .withColumn("distinct_cum", sum("n_new").over(w))
      .withColumn("dup_ppm",
        expr("(rows_cum - distinct_cum) * 1000000L div rows_cum"))
      .select("bucket", "rows_cum", "distinct_cum", "dup_ppm")
  }

  // ------------------------------------------------------------------
  // q152: per-document n-gram novelty
  // ------------------------------------------------------------------

  /** Per-document novelty: the ppm fraction of a document's DISTINCT
    * 3-word shingles that occur in no other document — high scores
    * mark genuinely novel text, low scores mark boilerplate stitched
    * from corpus-common phrasing. Complements q82 (self-repetition)
    * and q93 (chunk doc-frequency census) with a per-doc uniqueness
    * signal on the shingle level.
    *
    * Scale shape: distinct (doc, shingle-hash) pairs → one hash
    * aggregate for the doc-frequency table → one digest-keyed join
    * back → per-doc count aggregate. The novelty tag needs only
    * `df = 1`, so the join payload is a single boolean-bearing count.
    */
  val q152NgramNovelty: QueryDef = QueryDef.sql(
    "q152_ngram_novelty",
    s"""WITH ${TextHash.duckShingleCte(3)},
       |pairs AS (SELECT DISTINCT doc_id, h FROM sh),
       |df AS (SELECT h, count(*) AS n_docs FROM pairs GROUP BY h)
       |SELECT p.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       |  CAST((sum(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) * 1000000)
       |    // count(*) AS BIGINT) AS novelty_ppm
       |FROM pairs p JOIN df ON p.h = df.h
       |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin) { (spark, dir) =>
    ngramNoveltyDf(docs(spark, dir)).orderBy("doc_id")
  }

  /** The q152 novelty stage as a reusable corpus transform (also the
    * `Corpus.ngramNovelty` facade).
    */
  def ngramNoveltyDf(corpus: DataFrame, k: Int = 3): DataFrame = {
    val pairs = corpus
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        explode(TextHash.shingleHashesFromWords(col("ws"), k)).as("h"))
      .distinct()
    val df = pairs.groupBy("h").agg(count(lit(1)).as("n_docs"))
    pairs.join(df, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("n_docs") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty_ppm", expr("n_unique * 1000000L div n_shingles"))
  }

  // ------------------------------------------------------------------
  // q153: cross-source span-overlap matrix
  // ------------------------------------------------------------------

  /** Cross-source contamination matrix: for every source pair, the
    * number of distinct 8-word span digests occurring in BOTH, plus
    * containment ppm relative to the smaller side — the audit that
    * catches one crawl re-hosting another's content before both are
    * "independently" weighted in a mixture (q145 is the train/test
    * special case; this is the all-pairs source-level census).
    *
    * Scale shape: ONE corpus-wide shuffle total — the exploded spans
    * hash-aggregate straight to (digest → sorted source SET), whose
    * per-key state is bounded by |sources| (≤ a handful) and merges
    * map-side; per-source totals and the i<j pairs are both derived
    * from that already-aggregated relation (explode fan-out ≤
    * |sources| and ≤ |sources|² per digest), so no corpus-sized
    * relation is ever joined or re-shuffled. (The previous form —
    * distinct (source, digest) THEN a digest-keyed self-join — paid
    * two more corpus-wide exchanges for the same matrix.)
    */
  val q153SourceOverlap: QueryDef = QueryDef.sql(
    "q153_source_overlap",
    s"""WITH sp AS (SELECT DISTINCT d.source, md5(array_to_string(ws[i:i+7], ' ')) AS h
       |  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents) d,
       |    LATERAL (SELECT unnest(generate_series(1, len(ws) - 7)) AS i) g),
       |tot AS (SELECT source, count(*) AS n FROM sp GROUP BY source),
       |shared AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
       |  FROM sp a JOIN sp b ON a.h = b.h AND a.source < b.source
       |  GROUP BY a.source, b.source)
       |SELECT src_a, src_b, n_shared, ta.n AS n_a, tb.n AS n_b,
       |  CAST(CAST(n_shared AS HUGEINT) * 1000000 // least(ta.n, tb.n) AS BIGINT) AS containment_ppm
       |FROM shared JOIN tot ta ON src_a = ta.source JOIN tot tb ON src_b = tb.source
       |ORDER BY src_a, src_b""".stripMargin) { (spark, dir) =>
    sourceOverlapDf(docs(spark, dir)).orderBy("src_a", "src_b")
  }

  /** The q153 overlap matrix as a reusable corpus transform (also
    * the `Corpus.sourceOverlap` facade).
    */
  def sourceOverlapDf(corpus: DataFrame, spanWords: Int = 8): DataFrame = {
    // the one corpus-wide shuffle: digest -> sorted SET of sources
    // (collect_set state is bounded by |sources|, merges map-side)
    val byHash = corpus
      .select(col("source"), split(col("text"), " ").as("ws"))
      .select(col("source"),
        explode(TextHash.shinglesFromWords(col("ws"), spanWords)).as("span"))
      .select(md5(col("span")).as("h"), col("source"))
      .groupBy("h").agg(sort_array(collect_set(col("source"))).as("srcs"))
      // consumed twice (per-source totals + the pair matrix) — pinned
      // so the corpus shingle pass and its shuffle run once
      .scopedPersistEager()
    // everything below reads only the aggregated (h, srcs) relation:
    // explode fan-out per digest is ≤ |sources| (totals) and
    // ≤ |sources|² (pairs), and both aggregates combine map-side down
    // to |sources| / |sources|² rows before their (tiny) shuffles.
    val tot = byHash.select(explode(col("srcs")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n"))
    val shared = byHash
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(tot.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(tot.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
      .withColumn("containment_ppm",
        // DECIMAL(38) headroom: span counts reach ~10^13 at corpus
        // scale, so the int64 n*10^6 form would overflow (exact
        // integral divide either way; div returns BIGINT)
        expr("CAST(n_shared AS DECIMAL(38,0)) * 1000000 div least(n_a, n_b)"))
      .select("src_a", "src_b", "n_shared", "n_a", "n_b", "containment_ppm")
  }

  // ------------------------------------------------------------------
  // q154: Mann-Kendall monotonic trend on event cadence
  // ------------------------------------------------------------------

  /** Mann-Kendall S statistic per event type over the DAILY event
    * count series: `S = Σ_{i<j} sign(c_j − c_i)` — the standard
    * nonparametric "is this metric drifting?" test, integer-exact
    * (no ties correction needed for the report: S's sign and
    * magnitude are the signal).
    *
    * Scale shape: the raw stream first collapses to a (type, day)
    * count grid via one hash aggregate — the grid is CALENDAR-bounded
    * (days × types), not data-bounded, so the i<j pair join that
    * looks quadratic runs over a relation whose size is fixed by the
    * time range. At 100 TB the aggregate is the only corpus-sized
    * pass.
    */
  val q154MkTrend: QueryDef = QueryDef.sql(
    "q154_mk_trend",
    """WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |    count(*) AS c FROM events GROUP BY event_type, d),
      |pairs AS (SELECT a.event_type, CAST(sum(CASE WHEN b.c > a.c THEN 1
      |      WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM g a JOIN g b ON a.event_type = b.event_type AND a.d < b.d
      |  GROUP BY a.event_type),
      |nd AS (SELECT event_type, count(DISTINCT d) AS n_days FROM g GROUP BY event_type)
      |SELECT nd.event_type, nd.n_days, coalesce(p.s_stat, 0) AS s_stat,
      |  CASE WHEN coalesce(p.s_stat, 0) > 0 THEN 'up'
      |    WHEN coalesce(p.s_stat, 0) < 0 THEN 'down' ELSE 'flat' END AS trend
      |FROM nd LEFT JOIN pairs p ON nd.event_type = p.event_type
      |ORDER BY nd.event_type""".stripMargin) { (spark, dir) =>
    val g = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
    val pairs = g.select(col("event_type"), col("d").as("da"), col("c").as("ca"))
      .join(g.select(col("event_type"), col("d").as("db"), col("c").as("cb")),
        Seq("event_type"))
      .filter(col("da") < col("db"))
      .groupBy("event_type")
      .agg(sum(when(col("cb") > col("ca"), 1L)
        .when(col("cb") < col("ca"), -1L).otherwise(0L)).as("s_stat"))
    g.groupBy("event_type").agg(countDistinct("d").as("n_days"))
      .join(pairs, Seq("event_type"), "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("trend", when(col("s_stat") > 0, "up")
        .when(col("s_stat") < 0, "down").otherwise("flat"))
      .select("event_type", "n_days", "s_stat", "trend")
      .orderBy("event_type")
  }

  // ------------------------------------------------------------------
  // q157: seasonal decomposition of event cadence
  // ------------------------------------------------------------------

  /** Classical additive seasonal decomposition of the hourly event
    * count series, per event type: trend = centered 24-hour moving
    * average, seasonal = hour-of-day mean of the detrended series —
    * the diagnostic that separates "traffic is growing" from "it's
    * just evening" before any cadence alert fires.
    *
    * Exactness: the trend is an integer micro-mean
    * (`sum·10^6 div n` — counts are nonnegative so div == floor
    * division on both engines), detrended values are integer micros,
    * and the seasonal profile is one IEEE division of an exact
    * integer sum (< 2^53), rounded identically on both engines.
    *
    * Scale shape: the only corpus-sized pass is the (type, hour)
    * count aggregate; the trend window and seasonal aggregate run on
    * the CALENDAR-bounded grid (hours × types — q131's axis
    * argument), so per-type window partitions cannot skew with data
    * volume.
    */
  val q157SeasonalDecompose: QueryDef = QueryDef.sql(
    "q157_seasonal_decompose",
    """WITH g AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
      |    count(*) AS c FROM events GROUP BY event_type, h),
      |t AS (SELECT event_type, h, c,
      |    CAST(sum(c) OVER w * 1000000 AS BIGINT)
      |      // CAST(count(*) OVER w AS BIGINT) AS trend_micro
      |  FROM g WINDOW w AS (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
      |d AS (SELECT event_type, h % 24 AS hod,
      |    c * 1000000 - trend_micro AS detr_micro FROM t)
      |SELECT event_type, hod, count(*) AS n_hours,
      |  CAST(sum(detr_micro) AS BIGINT) AS seasonal_sum_micro,
      |  round(CAST(sum(detr_micro) AS BIGINT)::DOUBLE / count(*), 6) AS seasonal_mean
      |FROM d GROUP BY event_type, hod
      |ORDER BY event_type, hod""".stripMargin) { (spark, dir) =>
    val g = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("(ts div 1000) div 3600000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-11, 12)
    g.withColumn("sum_w", sum("c").over(w))
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("trend_micro", expr("sum_w * 1000000L div n_w"))
      .withColumn("detr_micro", col("c") * 1000000L - col("trend_micro"))
      .withColumn("hod", col("h") % 24)
      .groupBy("event_type", "hod")
      .agg(count(lit(1)).as("n_hours"), sum("detr_micro").as("seasonal_sum_micro"))
      .withColumn("seasonal_mean",
        round(col("seasonal_sum_micro").cast("double") / col("n_hours"), 6))
      .select("event_type", "hod", "n_hours", "seasonal_sum_micro", "seasonal_mean")
      .orderBy("event_type", "hod")
  }

  // ------------------------------------------------------------------
  // q158: quality band × duplication rate
  // ------------------------------------------------------------------

  /** Cross-signal audit: exact-duplicate rate per quality band — the
    * sanity check behind "filter by quality THEN dedup" ordering
    * decisions (boilerplate is both low-quality and highly
    * duplicated; if dup rate does NOT fall with quality, the quality
    * score is missing the boilerplate).
    *
    * Scale shape: bands come from the VALUE DOMAIN
    * (`quality_ppm div 100000` — no sort, no ntile, no
    * single-reducer rank), the dup flag from the q40 content-hash
    * aggregate; one join on doc_id, one 11-row output aggregate.
    */
  val q158QualityVsDup: QueryDef = QueryDef.sql(
    "q158_quality_vs_dup",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |dup AS (SELECT doc_id, (cnt > 1) AS is_dup FROM (
       |  SELECT doc_id, count(*) OVER (PARTITION BY md5(text)) AS cnt
       |  FROM documents)),
       |j AS (SELECT q.quality_ppm // 100000 AS band, d.is_dup
       |  FROM qq q JOIN dup d ON q.doc_id = d.doc_id)
       |SELECT band, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS dup_ppm
       |FROM j GROUP BY band ORDER BY band""".stripMargin) { (spark, dir) =>
    val d = docs(spark, dir)
    val dupCounts = d.select(md5(col("text")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("cnt"))
    val dup = d.select(col("doc_id"), md5(col("text")).as("h"))
      .join(dupCounts, Seq("h"))
      .select(col("doc_id"), (col("cnt") > 1).as("is_dup"))
    graft.operators.TextOps.withQuality(d)
      .select(col("doc_id"), expr("quality_ppm div 100000").as("band"))
      .join(dup, Seq("doc_id"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ppm", expr("n_dup * 1000000L div n_docs"))
      .select("band", "n_docs", "n_dup", "dup_ppm")
      .orderBy("band")
  }

  // ------------------------------------------------------------------
  // q159: BPE merge-candidate mining
  // ------------------------------------------------------------------

  /** The scoring pass of a BPE tokenizer-training step: adjacent
    * character-pair frequencies weighted by word frequency — the
    * top-scoring pair IS the next merge a byte-pair encoder would
    * learn. Run over the corpus this is the first (and by far the
    * most expensive) iteration of tokenizer training.
    *
    * Scale shape: the corpus collapses to a (word, count) vocabulary
    * first — one map-side-combined aggregate bounded by the
    * vocabulary, not the corpus — and the pair explosion runs over
    * that bounded relation (chars-per-word × vocab rows). Top-20 is
    * TakeOrderedAndProject. (Both engines index substrings by
    * character; the corpus is ASCII so UTF-16 vs UTF-8 offsets
    * cannot diverge.)
    */
  val q159BpeMerges: QueryDef = QueryDef.sql(
    "q159_bpe_merges",
    """WITH wt AS (SELECT w, count(*) AS n FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
      |pr AS (SELECT n, unnest(list_transform(generate_series(1, len(w) - 1),
      |    i -> w[i:i+1])) AS pair FROM wt WHERE len(w) >= 2)
      |SELECT pair, CAST(sum(n) AS BIGINT) AS n_occur
      |FROM pr GROUP BY pair
      |ORDER BY n_occur DESC, pair LIMIT 20""".stripMargin) { (spark, dir) =>
    docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(length(col("w")) >= 2)
      .select(col("n"), explode(
        expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(sum("n").as("n_occur"))
      .orderBy(col("n_occur").desc, col("pair"))
      .limit(20)
  }

  // ------------------------------------------------------------------
  // q160: retention cohort matrix
  // ------------------------------------------------------------------

  /** Weekly retention cohorts: users grouped by first-seen week, the
    * matrix cell (cohort, offset) counting how many came back
    * `offset` weeks later — THE standard growth-analytics report.
    *
    * Scale shape: one shuffle by user for the first-seen minimum, a
    * distinct (user, week) aggregate on the same axis, a user-keyed
    * join, and a final aggregate whose output is calendar-bounded
    * (weeks × offsets). Cohort sizes ride back on a broadcast of the
    * offset-0 diagonal, never a re-scan.
    */
  val q160RetentionCohorts: QueryDef = QueryDef.sql(
    "q160_retention_cohorts",
    """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |f AS (SELECT user_id, min(wk) AS cw FROM a GROUP BY user_id),
      |m AS (SELECT f.cw, a.wk - f.cw AS offs, count(DISTINCT a.user_id) AS n_users
      |  FROM a JOIN f ON a.user_id = f.user_id GROUP BY f.cw, a.wk - f.cw),
      |sz AS (SELECT cw, n_users AS cohort_n FROM m WHERE offs = 0)
      |SELECT m.cw AS cohort_week, m.offs AS week_offset, m.n_users, sz.cohort_n,
      |  CAST(m.n_users * 1000000 // sz.cohort_n AS BIGINT) AS retention_ppm
      |FROM m JOIN sz ON m.cw = sz.cw
      |ORDER BY cohort_week, week_offset""".stripMargin) { (spark, dir) =>
    val a = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts div 1000) div 604800000000").as("wk"))
      .distinct()
    val f = a.groupBy("user_id").agg(min("wk").as("cw"))
    val m = a.join(f, Seq("user_id"))
      .groupBy(col("cw"), (col("wk") - col("cw")).as("offs"))
      .agg(countDistinct("user_id").as("n_users"))
    val sz = m.filter(col("offs") === 0)
      .select(col("cw"), col("n_users").as("cohort_n"))
    m.join(broadcast(sz), Seq("cw"))
      .withColumn("retention_ppm", expr("n_users * 1000000L div cohort_n"))
      .select(col("cw").as("cohort_week"), col("offs").as("week_offset"),
        col("n_users"), col("cohort_n"), col("retention_ppm"))
      .orderBy("cohort_week", "week_offset")
  }

  // ------------------------------------------------------------------
  // q162: Theil–Sen robust slope
  // ------------------------------------------------------------------

  /** Theil–Sen estimator per event type: the MEDIAN of all pairwise
    * slopes of the daily count series — the robust companion to
    * q154's Mann-Kendall S (outlier days shift a least-squares fit
    * arbitrarily; they move the median slope by one rank at most).
    *
    * Median selection is deterministic on both engines: each slope
    * is ONE IEEE division of exact integers, the ordering
    * tie-breaks on (day_a, day_b), and the lower middle is taken at
    * rank `(n+1)/2`. The pair relation is calendar-bounded (days²
    * per type), reached from one corpus-sized count aggregate.
    */
  val q162TheilSen: QueryDef = QueryDef.sql(
    "q162_theil_sen",
    """WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |    count(*) AS c FROM events GROUP BY event_type, d),
      |p AS (SELECT a.event_type,
      |    (b.c - a.c)::DOUBLE / (b.d - a.d)::DOUBLE AS slope, a.d AS da, b.d AS db
      |  FROM g a JOIN g b ON a.event_type = b.event_type AND a.d < b.d),
      |r AS (SELECT event_type, slope,
      |    row_number() OVER (PARTITION BY event_type ORDER BY slope, da, db) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM p)
      |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
      |  round(slope, 6) AS ts_slope
      |FROM r WHERE rn = (n + 1) // 2
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val g = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
    val p = g.select(col("event_type"), col("d").as("da"), col("c").as("ca"))
      .join(g.select(col("event_type"), col("d").as("db"), col("c").as("cb")),
        Seq("event_type"))
      .filter(col("da") < col("db"))
      .select(col("event_type"),
        ((col("cb") - col("ca")).cast("double") /
          (col("db") - col("da")).cast("double")).as("slope"),
        col("da"), col("db"))
    val w = Window.partitionBy("event_type").orderBy("slope", "da", "db")
    p.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("n").as("n_pairs"),
        round(col("slope"), 6).as("ts_slope"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------------
  // q163: cross-source unigram cross-entropy (domain similarity)
  // ------------------------------------------------------------------

  /** Domain-similarity matrix: each source's tokens scored under
    * every source's unigram LM, in exact integer bits — the CCNet-
    * style "how surprised is model B by data A" signal that decides
    * which crawl slices resemble the target domain. Diagonal cells
    * are each source's own entropy; a LOW off-diagonal cell means the
    * two sources speak the same language (candidates for merging or
    * for contamination review).
    *
    * Bits are `floor(log2(N_b / c_b(w)))` as the bit length of the
    * integer quotient (q95's no-floating-log trick); an OOV token
    * costs `floor(log2(N_b)) + 1` — one bit beyond the rarest
    * possible in-vocab token, a deterministic escape penalty.
    *
    * Scale shape: the corpus is touched ONCE (the (source, word)
    * count aggregate); everything after runs on vocabulary-bounded
    * relations — a ×|sources| explode of the vocab and a vocab-keyed
    * left join. The output is the |sources|² matrix.
    */
  val q163DomainXent: QueryDef = QueryDef.sql(
    "q163_domain_xent",
    """WITH v AS (SELECT source, w, count(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY source, w),
      |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM v GROUP BY source),
      |x AS (SELECT a.source AS data_source, m.source AS model_source, a.w, a.c AS c_a,
      |    vm.c AS c_m, m.n AS n_m
      |  FROM v a CROSS JOIN tot m
      |  LEFT JOIN v vm ON vm.source = m.source AND vm.w = a.w),
      |b AS (SELECT data_source, model_source, c_a,
      |    CASE WHEN c_m IS NULL THEN length(printf('%b', n_m))
      |         ELSE length(printf('%b', n_m // c_m)) - 1 END AS bits
      |  FROM x)
      |SELECT data_source, model_source,
      |  CAST(sum(c_a) AS BIGINT) AS n_tokens,
      |  CAST(sum(c_a * bits) AS BIGINT) AS total_bits,
      |  CAST(sum(c_a * bits) * 1000 // sum(c_a) AS BIGINT) AS bits_per_token_milli
      |FROM b GROUP BY data_source, model_source
      |ORDER BY data_source, model_source""".stripMargin) { (spark, dir) =>
    domainXentDf(docs(spark, dir)).orderBy("data_source", "model_source")
  }

  /** The q163 matrix as a reusable corpus transform (also the
    * `Corpus.domainXent` facade).
    */
  def domainXentDf(corpus: DataFrame): DataFrame = {
    val v = corpus
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .scopedPersist()
    val tot = v.groupBy("source").agg(sum("c").as("n"))
    val x = v.select(col("source").as("data_source"), col("w"), col("c").as("c_a"))
      .crossJoin(broadcast(tot.select(col("source").as("model_source"), col("n").as("n_m"))))
      .join(v.select(col("source").as("model_source"), col("w"), col("c").as("c_m")),
        Seq("model_source", "w"), "left")
    x.withColumn("bits",
        when(col("c_m").isNull, length(bin(col("n_m"))))
          .otherwise(length(bin(expr("n_m div c_m"))) - 1).cast("long"))
      .groupBy("data_source", "model_source")
      .agg(sum("c_a").as("n_tokens"), sum(expr("c_a * bits")).as("total_bits"))
      .withColumn("bits_per_token_milli", expr("total_bits * 1000L div n_tokens"))
      .select("data_source", "model_source", "n_tokens", "total_bits",
        "bits_per_token_milli")
  }

  // ------------------------------------------------------------------
  // q164: trailing-7-day distinct users via mergeable HLL registers
  // ------------------------------------------------------------------

  /** Weekly-active-users per day from MERGEABLE sketches: each day's
    * 4096 HLL registers are built once, and every day's trailing-7-
    * day estimate is a register-max merge — the data is NEVER
    * rescanned per window, which is the whole point of sketch-based
    * WAU at 100 TB (a naive `count(DISTINCT)` per sliding window
    * rescans every row 7 times and holds per-window exact sets).
    *
    * The merge is expressed as a bounded explode: each (day, bucket,
    * reg) row serves at most 7 future evaluation days, so the
    * register relation fans out ×7 (calendar-bounded rows), then one
    * max-aggregate per (eval day, bucket) and one harmonic rollup
    * per day. No range join, no window over raw rows. Estimates use
    * q135's exact-dyadic harmonic sum, emitted unrounded.
    */
  val q164SlidingWau: QueryDef = {
    val m = 4096
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble
    val aLit = graft.functions.KernelOracles.lit(alphaM2)
    QueryDef.sql(
      "q164_sliding_wau",
      s"""WITH t AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS d,
         |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS h FROM events),
         |b AS (SELECT d, h >> 20 AS bucket,
         |    CASE WHEN (h & 1048575) = 0 THEN 21
         |         ELSE 21 - length(printf('%b', h & 1048575)) END AS rho
         |  FROM t),
         |r AS (SELECT d, bucket, max(rho) AS reg FROM b GROUP BY d, bucket),
         |days AS (SELECT DISTINCT d FROM r),
         |serve AS (SELECT unnest(generate_series(r.d, r.d + 6)) AS ed, bucket, reg FROM r),
         |mg AS (SELECT s.ed, s.bucket, max(s.reg) AS reg
         |  FROM serve s JOIN days dd ON s.ed = dd.d GROUP BY s.ed, s.bucket),
         |e AS (SELECT ed, count(*) AS n_reg,
         |    sum(1e0 / (1::BIGINT << reg)) AS sp FROM mg GROUP BY ed)
         |SELECT ed AS day, CAST(n_reg AS BIGINT) AS n_registers,
         |  CAST($m - n_reg AS BIGINT) AS n_zero,
         |  $aLit / (sp + ($m - n_reg)) AS raw_est
         |FROM e ORDER BY day""".stripMargin) { (spark, dir) =>
      val t = graft.sources.Tables.events(spark, dir)
        .select(expr("(ts div 1000) div 86400000000").as("d"),
          TextHash.base32(col("user_id").cast("string")).as("h"))
        .distinct()
      val rest = col("h").bitwiseAND(lit(1048575L))
      val r = t.select(col("d"), shiftright(col("h"), 20).as("bucket"),
          when(rest === 0, lit(21)).otherwise(lit(21) - length(bin(rest))).as("rho"))
        .groupBy("d", "bucket").agg(max("rho").as("reg"))
        .scopedPersistEager()
      val days = r.select(col("d")).distinct()
      val serve = r.select(explode(expr("sequence(d, d + 6)")).as("ed"),
        col("bucket"), col("reg"))
      serve.join(broadcast(days.withColumnRenamed("d", "ed")), Seq("ed"))
        .groupBy("ed", "bucket").agg(max("reg").as("reg"))
        .groupBy("ed")
        .agg(count(lit(1)).as("n_reg"),
          sum(lit(1.0) / expr("shiftleft(1L, cast(reg as int))")).as("sp"))
        .select(col("ed").as("day"), col("n_reg").as("n_registers"),
          (lit(m.toLong) - col("n_reg")).as("n_zero"),
          (lit(alphaM2) / (col("sp") + (lit(m.toLong) - col("n_reg")))).as("raw_est"))
        .orderBy("day")
    }
  }

  // ------------------------------------------------------------------
  // q166: RFM segmentation
  // ------------------------------------------------------------------

  /** RFM (recency / frequency / monetary) segmentation of purchasing
    * users — the classic CRM scoring: days since last purchase,
    * purchase count, and milli-quantized spend, folded into a
    * deterministic 3-digit class by fixed value-domain thresholds
    * (recency <7d/<30d/else, frequency ≥10/≥3/else, monetary
    * ≥100/≥20/else — threshold bands, NOT quantile ranks, so no
    * global sort exists anywhere in the plan).
    *
    * Scale shape: one user-keyed aggregate over purchases plus a
    * broadcast 1-row "now" scalar. Monetary sums are quantized to
    * integer millis BEFORE aggregation, so parallel reduction order
    * cannot move the hash.
    */
  val q166RfmSegments: QueryDef = QueryDef.sql(
    "q166_rfm_segments",
    """WITH p AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
      |    CAST(round(value * 1000.0) AS BIGINT) AS v_milli
      |  FROM events WHERE event_type = 'purchase'),
      |mx AS (SELECT max(d) AS now_d FROM p),
      |u AS (SELECT user_id, mx.now_d - max(d) AS r_days, count(*) AS f,
      |    CAST(sum(v_milli) AS BIGINT) AS m_milli
      |  FROM p, mx GROUP BY user_id, mx.now_d)
      |SELECT user_id, r_days, f, m_milli,
      |  (CASE WHEN r_days < 7 THEN '1' WHEN r_days < 30 THEN '2' ELSE '3' END ||
      |   CASE WHEN f >= 10 THEN '1' WHEN f >= 3 THEN '2' ELSE '3' END ||
      |   CASE WHEN m_milli >= 100000 THEN '1' WHEN m_milli >= 20000 THEN '2'
      |     ELSE '3' END) AS rfm_class
      |FROM u ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val p = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("d"),
        expr("cast(round(value * 1000.0) as bigint)").as("v_milli"))
    val mx = p.agg(max("d").as("now_d"))
    val u = p.crossJoin(broadcast(mx))
      .groupBy("user_id", "now_d")
      .agg(max("d").as("last_d"), count(lit(1)).as("f"), sum("v_milli").as("m_milli"))
      .withColumn("r_days", col("now_d") - col("last_d"))
    u.withColumn("rfm_class", concat(
        when(col("r_days") < 7, "1").when(col("r_days") < 30, "2").otherwise("3"),
        when(col("f") >= 10, "1").when(col("f") >= 3, "2").otherwise("3"),
        when(col("m_milli") >= 100000, "1").when(col("m_milli") >= 20000, "2")
          .otherwise("3")))
      .select("user_id", "r_days", "f", "m_milli", "rfm_class")
      .orderBy("user_id")
  }

  // ------------------------------------------------------------------
  // q167: burst detection (trailing-baseline anomaly)
  // ------------------------------------------------------------------

  /** Burst detection on the hourly event grid: an hour is a burst
    * when its count exceeds the trailing-24h baseline by 3σ. The
    * comparison is cross-multiplied into pure integer arithmetic —
    * `(c·n − S)² > 9·(n·S2 − S²)` with `c > S/n` — so no sqrt, no
    * float, no tolerance anywhere (same no-float discipline as q103's
    * CUSUM). Baselines need ≥12 trailing hours to arm.
    *
    * Scale shape: the corpus-sized pass is the (type, hour) count
    * aggregate; the trailing RANGE window runs on the
    * calendar-bounded grid. Integer headroom: the cross-multiplied
    * terms stay inside int64 while n·c² < 2^63 — hourly counts up to
    * ~6×10^8 per type, beyond bench scale by 5 orders; past that,
    * re-derive on DECIMAL(38).
    */
  val q167BurstDetect: QueryDef = QueryDef.sql(
    "q167_burst_detect",
    """WITH g AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
      |    count(*) AS c FROM events GROUP BY event_type, h),
      |w AS (SELECT event_type, h, c,
      |    count(*) OVER tw AS n, CAST(sum(c) OVER tw AS BIGINT) AS s,
      |    CAST(sum(c * c) OVER tw AS BIGINT) AS s2
      |  FROM g WINDOW tw AS (PARTITION BY event_type ORDER BY h
      |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, h, c, CAST(n AS BIGINT) AS n_base, s AS base_sum
      |FROM w
      |WHERE n >= 12 AND c * n > s
      |  AND (c * n - s) * (c * n - s) > 9 * (n * s2 - s * s)
      |ORDER BY event_type, h""".stripMargin) { (spark, dir) =>
    val g = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("(ts div 1000) div 3600000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
    val tw = Window.partitionBy("event_type").orderBy("h").rangeBetween(-24, -1)
    g.withColumn("n", count(lit(1)).over(tw))
      .withColumn("s", sum("c").over(tw))
      .withColumn("s2", sum(expr("c * c")).over(tw))
      .filter(col("n") >= 12 && expr("c * n > s") &&
        expr("(c * n - s) * (c * n - s) > 9 * (n * s2 - s * s)"))
      .select(col("event_type"), col("h"), col("c"), col("n").as("n_base"),
        col("s").as("base_sum"))
      .orderBy("event_type", "h")
  }

  // ------------------------------------------------------------------
  // q172: Wilson lower-bound conversion ranking
  // ------------------------------------------------------------------

  /** Rank users by the Wilson-score LOWER bound of their purchase
    * rate — the confidence-adjusted ranking that stops a 1-for-1
    * user outranking a 40-for-100 one (the standard fix for naive
    * rate sorting, z = 1.96).
    *
    * Determinism: counts are exact integers; the bound is ONE shared
    * IEEE expression string evaluated with the identical parse tree
    * on both engines (every div/sqrt correctly rounded), then
    * rounded. Top-50 is TakeOrderedAndProject over one user-keyed
    * aggregate.
    */
  val q172WilsonRank: QueryDef = {
    val wilson =
      "(phat + 3.8416 / (2 * nd) - 1.96 * sqrt((phat * (1 - phat) " +
        "+ 3.8416 / (4 * nd)) / nd)) / (1 + 3.8416 / nd)"
    QueryDef.sql(
      "q172_wilson_rank",
      s"""WITH u AS (SELECT user_id, count(*) AS n,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS k
         |  FROM events GROUP BY user_id),
         |e AS (SELECT user_id, n, k, CAST(n AS DOUBLE) AS nd,
         |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS phat FROM u)
         |SELECT user_id, n, k, round($wilson, 6) AS wilson_lb
         |FROM e ORDER BY wilson_lb DESC, user_id LIMIT 50""".stripMargin) { (spark, dir) =>
      graft.sources.Tables.events(spark, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("k"))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("phat", col("k").cast("double") / col("n").cast("double"))
        .withColumn("wilson_lb", round(expr(wilson), 6))
        .select("user_id", "n", "k", "wilson_lb")
        .orderBy(col("wilson_lb").desc, col("user_id"))
        .limit(50)
    }
  }

  // ------------------------------------------------------------------
  // q173: conversion-latency quantiles by signup cohort
  // ------------------------------------------------------------------

  /** Time-to-convert by signup cohort: for users who completed the
    * q99 view→click→purchase funnel, the exact p50/p90 of the
    * view→purchase latency per first-seen DAY — the report that
    * shows whether newer cohorts convert faster.
    *
    * Scale shape: the funnel stays q99's one user shuffle; latencies
    * milli-quantize and roll up to a VALUE HISTOGRAM per cohort
    * (q108's trick), so the exact percentiles never buffer a
    * cohort's raw latencies; cohort count is calendar-bounded.
    */
  val q173ConversionLatency: QueryDef = QueryDef.sql(
    "q173_conversion_latency",
    s"""WITH s AS (SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS dy,
       |    t - min(t) OVER (PARTITION BY user_id) AS tn
       |  FROM (SELECT *, epoch_us(ts) / 1000000.0 AS t FROM events)),
       |v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tn END)
       |    OVER (PARTITION BY user_id) AS t_view FROM s),
       |c AS (SELECT *, min(CASE WHEN event_type = 'click' AND tn > t_view
       |    AND tn <= t_view + ${PipelineOps.ClickWindowSec} THEN tn END)
       |    OVER (PARTITION BY user_id) AS t_click FROM v),
       |p AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tn > t_click
       |    AND tn <= t_click + ${PipelineOps.BuyWindowSec} THEN tn END)
       |    OVER (PARTITION BY user_id) AS t_buy FROM c),
       |u AS (SELECT user_id, min(dy) AS cw, min(t_view) AS t_view,
       |    min(t_buy) AS t_buy FROM p GROUP BY user_id),
       |conv AS (SELECT cw, CAST(round((t_buy - t_view) * 1000.0) AS BIGINT) AS lm
       |  FROM u WHERE t_buy IS NOT NULL)
       |SELECT cw AS cohort_day, count(*) AS n_converted,
       |  round(CAST(sum(lm) AS BIGINT)::DOUBLE / count(*) / 1000.0, 6) AS mean_sec,
       |  round(quantile_cont(lm, 0.5) / 1000.0, 6) AS p50_sec,
       |  round(quantile_cont(lm, 0.9) / 1000.0, 6) AS p90_sec
       |FROM conv GROUP BY cw ORDER BY cohort_day""".stripMargin) { (spark, dir) =>
    val s = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("(ts div 1000) div 86400000000").as("dy"),
        (expr("ts div 1000") / lit(1e6)).as("t"))
      .withColumn("tn", col("t") - min("t").over(Window.partitionBy("user_id")))
    val uw = Window.partitionBy("user_id")
    val p = s
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("tn"))).over(uw))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("tn") > col("t_view") &&
          col("tn") <= col("t_view") + PipelineOps.ClickWindowSec, col("tn"))).over(uw))
      .withColumn("t_buy",
        min(when(col("event_type") === "purchase" && col("tn") > col("t_click") &&
          col("tn") <= col("t_click") + PipelineOps.BuyWindowSec, col("tn"))).over(uw))
    val conv = p.groupBy("user_id")
      .agg(min("dy").as("cw"), min("t_view").as("t_view"), min("t_buy").as("t_buy"))
      .filter(col("t_buy").isNotNull)
      .select(col("cw"),
        expr("cast(round((t_buy - t_view) * 1000.0) as bigint)").as("lm"))
    // exact interpolated percentiles off the (cohort, lm) histogram —
    // q108's shape: never a per-cohort value buffer
    val hist = conv.groupBy("cw", "lm").agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum("cnt").over(Window.partitionBy("cw").orderBy("lm")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("cw")))
    def bracket(pp: Double, tag: String): Seq[org.apache.spark.sql.Column] = {
      val pos = (col("n") - 1).cast("double") * lit(pp)
      val lo = floor(pos); val hi = ceil(pos)
      Seq(
        min(when(col("cum") - col("cnt") <= lo && lo < col("cum"), col("lm"))).as(s"vlo_$tag"),
        min(when(col("cum") - col("cnt") <= hi && hi < col("cum"), col("lm"))).as(s"vhi_$tag"))
    }
    val aggs = Seq(max("n").as("n_converted"), sum(col("lm") * col("cnt")).as("lm_sum")) ++
      bracket(0.5, "50") ++ bracket(0.9, "90")
    val agged = cum.groupBy("cw").agg(aggs.head, aggs.tail: _*)
    def interp(pp: Double, vlo: org.apache.spark.sql.Column,
        vhi: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val pos = (col("n_converted") - 1).cast("double") * lit(pp)
      val lo = floor(pos); val hi = ceil(pos)
      when(lo === hi || vlo === vhi, vlo.cast("double"))
        .otherwise((hi.cast("double") - pos) * vlo.cast("double") +
          (pos - lo.cast("double")) * vhi.cast("double"))
    }
    agged.select(col("cw").as("cohort_day"), col("n_converted"),
      round(col("lm_sum").cast("double") / col("n_converted") / 1e3, 6).as("mean_sec"),
      round(interp(0.5, col("vlo_50"), col("vhi_50")) / 1e3, 6).as("p50_sec"),
      round(interp(0.9, col("vlo_90"), col("vhi_90")) / 1e3, 6).as("p90_sec"))
      .orderBy("cohort_day")
  }

  // ------------------------------------------------------------------
  // q174: rendezvous (HRW) shard routing + resharding-churn audit
  // ------------------------------------------------------------------

  /** Rendezvous (highest-random-weight) hashing for shard routing:
    * each document goes to the shard with the maximal
    * `md5(doc_id · shard)` weight — the stateless assignment scheme
    * whose defining property is MINIMAL CHURN on resharding (growing
    * 8 → 9 shards moves only ~1/9 of keys, vs ~8/9 for mod-N). The
    * query computes both assignments and reports per-shard counts
    * plus the measured moved fraction — the audit a storage layer
    * runs before committing to a reshard.
    *
    * Scale shape: a ×(shards+shards') explode of the key relation,
    * two argmax aggregates keyed on the document, one 1-row churn
    * rollup. No joins against data, no shuffle beyond the doc key.
    */
  val q174RendezvousShards: QueryDef = {
    val s0 = 8; val s1 = 9
    QueryDef.sql(
      "q174_rendezvous_shards",
      s"""WITH w AS (SELECT doc_id, s,
         |    ('0x' || substr(md5(doc_id::VARCHAR || ':' || s::VARCHAR), 1, 8))::BIGINT * 16 + s AS wt
         |  FROM documents, range(0, $s1) t(s)),
         |a AS (SELECT doc_id,
         |    CAST(arg_max(s, CASE WHEN s < $s0 THEN wt END) AS BIGINT) AS shard8,
         |    CAST(arg_max(s, wt) AS BIGINT) AS shard9
         |  FROM w GROUP BY doc_id)
         |SELECT shard8, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
         |  CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS moved_ppm
         |FROM a GROUP BY shard8 ORDER BY shard8""".stripMargin) { (spark, dir) =>
      val weights = docs(spark, dir)
        .select(col("doc_id"), explode(expr(s"sequence(0, ${s1 - 1})")).as("s"))
        // the tie-safe weight: 32-bit hash ⊕ shard id in the low bits,
        // so two shards can never carry the same weight for one key
        .withColumn("wt",
          TextHash.base32(concat(col("doc_id").cast("string"), lit(":"),
            col("s").cast("string"))) * 16 + col("s"))
      val a = weights.groupBy("doc_id")
        .agg(expr(s"cast(max_by(s, IF(s < $s0, wt, NULL)) as bigint)").as("shard8"),
          expr("cast(max_by(s, wt) as bigint)").as("shard9"))
      a.groupBy("shard8")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L)).as("n_moved"))
        .withColumn("moved_ppm", expr("n_moved * 1000000L div n_docs"))
        .select("shard8", "n_docs", "n_moved", "moved_ppm")
        .orderBy("shard8")
    }
  }

  // ------------------------------------------------------------------
  // q175: HLL calibration audit (estimate vs exact)
  // ------------------------------------------------------------------

  /** Sketch-calibration audit: q135's HLL register census beside the
    * exact per-source token count — the companion audit to q165's
    * ANN recall (every approximate structure in the engine ships
    * with the query that measures it). The hash-checked columns are
    * the exact count and the REGISTER state (n_reg, n_zero,
    * raw harmonic estimate): the raw estimate is deliberately
    * reported out-of-regime (below 2.5·m it is biased to ≈ α·m —
    * visible here), and the corrected number comes from the
    * engine-side [[Sketches.hllCorrected]] linear-counting branch,
    * whose `ln` is kept OUT of the oracle hash (libm ln is not
    * correctly rounded, so it cannot be hash-compared across
    * engines; AuditOpsSpec pins its 5% accuracy instead).
    *
    * The exact side is a distinct aggregate (expensive but exact);
    * at 100 TB this runs on a source sample as a canary, which is
    * why it stays separate from q135 itself.
    */
  val q175HllCalibration: QueryDef = {
    val m = 4096
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble
    val aLit = graft.functions.KernelOracles.lit(alphaM2)
    QueryDef.sql(
      "q175_hll_calibration",
      s"""WITH t AS (SELECT source, token, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)),
         |ex AS (SELECT source, count(DISTINCT token) AS n_exact FROM t GROUP BY source),
         |b AS (SELECT source, h >> 20 AS bucket,
         |    CASE WHEN (h & 1048575) = 0 THEN 21
         |         ELSE 21 - length(printf('%b', h & 1048575)) END AS rho
         |  FROM t),
         |r AS (SELECT source, bucket, max(rho) AS reg FROM b GROUP BY source, bucket),
         |e AS (SELECT source, count(*) AS n_reg,
         |    sum(1e0 / (1::BIGINT << reg)) AS sp FROM r GROUP BY source)
         |SELECT ex.source, ex.n_exact, CAST(e.n_reg AS BIGINT) AS n_reg,
         |  CAST($m - e.n_reg AS BIGINT) AS n_zero,
         |  $aLit / (e.sp + ($m - e.n_reg)) AS raw_est
         |FROM ex JOIN e ON ex.source = e.source
         |ORDER BY ex.source""".stripMargin) { (spark, dir) =>
      val t = docs(spark, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
        .select(col("source"), col("token"), TextHash.base32(col("token")).as("h"))
        .scopedPersistEager()
      val ex = t.groupBy("source").agg(countDistinct("token").as("n_exact"))
      val rest = col("h").bitwiseAND(lit(1048575L))
      val e = t
        .select(col("source"), shiftright(col("h"), 20).as("bucket"),
          when(rest === 0, lit(21)).otherwise(lit(21) - length(bin(rest))).as("rho"))
        .groupBy("source", "bucket").agg(max("rho").as("reg"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_reg"),
          sum(lit(1.0) / expr("shiftleft(1L, cast(reg as int))")).as("sp"))
      ex.join(e, Seq("source"))
        .select(col("source"), col("n_exact"), col("n_reg"),
          (lit(m.toLong) - col("n_reg")).as("n_zero"),
          (lit(alphaM2) / (col("sp") + (lit(m.toLong) - col("n_reg")))).as("raw_est"))
        .orderBy("source")
    }
  }

  // ------------------------------------------------------------------
  // q176: half-life-decayed lifetime value
  // ------------------------------------------------------------------

  /** Exponentially-decayed lifetime value with a one-week half-life,
    * computed WITHOUT floats: each purchase contributes
    * `v_milli div 2^(weeks_ago)` — halving per elapsed week is
    * exactly a right shift, so the decayed LTV is a pure integer sum
    * (the no-float analogue of `v·e^{-λt}` scoring). Top-50 users.
    *
    * Scale shape: one user-keyed aggregate + a broadcast 1-row "now"
    * scalar; TakeOrderedAndProject for the ranking.
    */
  val q176DecayedLtv: QueryDef = QueryDef.sql(
    "q176_decayed_ltv",
    """WITH p AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
      |    CAST(round(value * 1000.0) AS BIGINT) AS v_milli
      |  FROM events WHERE event_type = 'purchase'),
      |mx AS (SELECT max(wk) AS now_w FROM p),
      |u AS (SELECT user_id, count(*) AS n_purchases,
      |    CAST(sum(v_milli) AS BIGINT) AS raw_milli,
      |    CAST(sum(v_milli // (1::BIGINT << LEAST(mx.now_w - wk, 62))) AS BIGINT)
      |      AS ltv_milli
      |  FROM p, mx GROUP BY user_id)
      |SELECT user_id, n_purchases, raw_milli, ltv_milli
      |FROM u ORDER BY ltv_milli DESC, user_id LIMIT 50""".stripMargin) { (spark, dir) =>
    val p = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("(ts div 1000) div 604800000000").as("wk"),
        expr("cast(round(value * 1000.0) as bigint)").as("v_milli"))
    val mx = p.agg(max("wk").as("now_w"))
    p.crossJoin(broadcast(mx))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"), sum("v_milli").as("raw_milli"),
        sum(expr("v_milli div shiftleft(1L, cast(least(now_w - wk, 62) as int))"))
          .as("ltv_milli"))
      .select("user_id", "n_purchases", "raw_milli", "ltv_milli")
      .orderBy(col("ltv_milli").desc, col("user_id"))
      .limit(50)
  }

  // ------------------------------------------------------------------
  // q189: chi-square independence audit (source × lang)
  // ------------------------------------------------------------------

  /** q189: Pearson chi-square independence screen over the
    * source × lang contingency table — "is language mix independent
    * of source?", the drift alarm run before trusting per-source
    * language filters. Every margin is an exact integer window sum
    * over the |sources|×|langs| grid; `expected` and the per-cell
    * chi-square term are single fixed-order double expressions of
    * those integers (mul → cast → div → sub → mul → div → round), so
    * both engines produce identical bits before the shared round.
    *
    * Scale shape: ONE hash aggregate bounded by the label domain,
    * then windows over that tiny grid — raw rows never shuffle.
    */
  val q189ChiSquare: QueryDef = QueryDef.sql(
    "q189_chi_square",
    """WITH c AS (SELECT source, lang, count(*) AS n
      |  FROM documents GROUP BY source, lang),
      |t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS rt,
      |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS ct,
      |    CAST(sum(n) OVER () AS BIGINT) AS tot FROM c)
      |SELECT source, lang, CAST(n AS BIGINT) AS n,
      |  round(CAST(rt * ct AS DOUBLE) / tot, 6) AS expected,
      |  round((n - CAST(rt * ct AS DOUBLE) / tot) * (n - CAST(rt * ct AS DOUBLE) / tot)
      |    / (CAST(rt * ct AS DOUBLE) / tot), 6) AS chi2_term
      |FROM t ORDER BY source, lang""".stripMargin) { (spark, dir) =>
    chiSquareDf(docs(spark, dir), "source", "lang").orderBy("source", "lang")
  }

  /** The q189 audit as a reusable stage over any two label columns. */
  def chiSquareDf(df: DataFrame, rowCol: String, colCol: String): DataFrame =
    chiSquareFromCounts(
      df.groupBy(rowCol, colCol).agg(count(lit(1)).as("n")), rowCol, colCol)

  /** The margin/statistic half of q189 over an already-aggregated
    * (row, col, n) contingency relation — shared with the streaming
    * drift monitor, whose keyed state IS that relation.
    */
  def chiSquareFromCounts(c: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val e = expr("CAST(rt * ct AS DOUBLE)") / col("tot")
    c.withColumn("rt", sum("n").over(Window.partitionBy(rowCol)))
      .withColumn("ct", sum("n").over(Window.partitionBy(colCol)))
      .withColumn("tot", sum("n").over(Window.partitionBy()))
      .select(col(rowCol), col(colCol), col("n"),
        round(e, 6).as("expected"),
        round((col("n") - e) * (col("n") - e) / e, 6).as("chi2_term"))
  }

  // ------------------------------------------------------------------
  // q191: per-source OLS fit (quality ~ length)
  // ------------------------------------------------------------------

  /** q191: closed-form simple linear regression of quality on
    * document length per source — slope, intercept and R², the
    * "does our quality score just reward length?" audit (the
    * regression sibling of q162's Theil-Sen rank slope).
    *
    * Determinism: the five moment sums are EXACT int64 aggregates
    * (order-insensitive); `a = n·Sxy − Sx·Sy`, `b = n·Sxx − Sx²`,
    * `c = n·Syy − Sy²` are exact int64 products cast to double, and
    * slope/intercept/R² are fixed-order double expressions of those
    * three exact values, rounded once. Degenerate margins (constant
    * x or y) emit NULL identically on both engines.
    *
    * Scale shape: one map-side-combined aggregate per source — the
    * scan never shuffles rows, only five moments per source.
    */
  val q191OlsFit: QueryDef = QueryDef.sql(
    "q191_ols_fit",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |d AS (SELECT d.source, d.n_chars AS x, CAST(q.quality_ppm AS BIGINT) AS y
       |  FROM qq q JOIN documents d ON q.doc_id = d.doc_id),
       |m AS (SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy, sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM d GROUP BY source),
       |e AS (SELECT source, n, sx, sy,
       |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS a,
       |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS b,
       |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS c FROM m)
       |SELECT source, CAST(n AS BIGINT) AS n,
       |  round(CASE WHEN b <> 0 THEN a / b END, 6) AS slope,
       |  round(CASE WHEN b <> 0 THEN (sy - a / b * sx) / n END, 6) AS intercept,
       |  round(CASE WHEN b <> 0 AND c <> 0 THEN a * a / (b * c) END, 6) AS r2
       |FROM e ORDER BY source""".stripMargin) { (spark, dir) =>
    val d = graft.operators.TextOps.withQuality(docs(spark, dir))
      .select(col("source"), col("n_chars").cast("long").as("x"),
        col("quality_ppm").cast("long").as("y"))
    olsFitDf(d, "source", "x", "y").orderBy("source")
  }

  /** The q191 regression as a reusable stage over any (key, x, y). */
  def olsFitDf(df: DataFrame, key: String, x: String, y: String): DataFrame = {
    val m = df.groupBy(key).agg(count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      // DECIMAL(20) factors: the squared/cross SUMS overflow int64
      // once a group holds ~9M ppm-scaled rows; DuckDB widens the same
      // sums to HUGEINT, so both engines stay exact and equal
      sum(expr(s"CAST($x AS DECIMAL(20,0)) * $x")).as("sxx"),
      sum(expr(s"CAST($x AS DECIMAL(20,0)) * $y")).as("sxy"),
      sum(expr(s"CAST($y AS DECIMAL(20,0)) * $y")).as("syy"))
    // WIDE-INTEGER cross terms: n·Σxy − Σx·Σy computed in
    // DECIMAL(38,0) (HUGEINT in DuckDB) and cast to double AFTER the
    // exact subtraction — the double-product form suffered
    // catastrophic cancellation past 2^53, losing every significant
    // digit exactly in the large-group regime; this stays exact to
    // ~10^38 and both engines convert the same integer identically.
    // PAST the exact range the engines diverge in FAILURE MODE, not
    // value: Spark's non-ANSI DECIMAL(38,0) product returns NULL on
    // precision loss (slope/r2 quietly NULL), DuckDB HUGEINT raises,
    // and the caps differ (~1e38 vs ~1.7e38). With |x|,|y| ≤ 1e15 and
    // group sizes ≤ 1e7 the cross terms stay ≤ ~1e37 — inside both
    // regimes; a corpus past that needs a pre-scaling pass, not wider
    // integers. PropertySpec pins BigInt-exactness at |x| = 1e15; the
    // same regime note covers every DECIMAL(38) site that cites
    // "olsFitDf's policy" / "q98's note".
    val e = m.select(col(key), col("n"), col("sx"), col("sy"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)").as("a"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)").as("b"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)").as("c"))
    e.select(col(key), col("n"),
      round(when(col("b") =!= 0, col("a") / col("b")), 6).as("slope"),
      round(when(col("b") =!= 0,
        (col("sy") - col("a") / col("b") * col("sx")) / col("n")), 6).as("intercept"),
      round(when(col("b") =!= 0 && col("c") =!= 0,
        col("a") * col("a") / (col("b") * col("c"))), 6).as("r2"))
  }

  // ------------------------------------------------------------------
  // q193: isotonic calibration of the quality→dup curve (PAVA)
  // ------------------------------------------------------------------

  /** q193: ANTITONIC (monotone non-increasing — higher quality must
    * not mean more duplication) calibration of the quality-band →
    * span-duplication-rate curve (the q184 flag bucketed by q158's
    * bands): the pool-adjacent-violators fit expressed
    * in its min-max closed form
    * `fit(i) = min_{j≤i} max_{k≥i} wavg(dup, [j..k])` (the mirror of
    * the isotonic `max-min` characterization of weighted-L2 monotone
    * regression) — turned into joins over the ≤11-row band histogram
    * so no iterative pooling is needed. Calibrated curves are what
    * sampling policies consume when the raw per-band rates are noisy
    * at the tails.
    *
    * Determinism: each interval average is ONE integer division of
    * exact counts (`1e6·dup(j..k) div n(j..k)`), and min/max over
    * integers are order-free — the whole fit is integer-exact ppm.
    *
    * Scale shape: the corpus collapses to the band histogram first
    * (one bounded hash aggregate, the q158 shape); the O(bands³)
    * max-min runs on that tiny relation.
    */
  val q193IsotonicCal: QueryDef = QueryDef.sql(
    "q193_isotonic_cal",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |sp AS (SELECT doc_id, md5(unnest(list_transform(
       |    generate_series(1, len(ws) - ${graft.operators.PipelineOps.SpanWords - 1}),
       |    i -> array_to_string(ws[i:i+${graft.operators.PipelineOps.SpanWords - 1}], ' ')))) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |g AS (SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |dd AS (SELECT DISTINCT sp.doc_id FROM sp JOIN g USING (h)),
       |b AS (SELECT q.quality_ppm // 100000 AS band,
       |    count(*) AS n_docs,
       |    CAST(sum(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |  FROM qq q LEFT JOIN dd ON q.doc_id = dd.doc_id GROUP BY band),
       |p AS (SELECT band, n_docs, n_dup,
       |    CAST(sum(n_docs) OVER (ORDER BY band) AS BIGINT) AS cn,
       |    CAST(sum(n_dup) OVER (ORDER BY band) AS BIGINT) AS cd FROM b),
       |a AS (SELECT j.band AS jb, k.band AS kb,
       |    1000000 * (k.cd - (j.cd - j.n_dup)) // (k.cn - (j.cn - j.n_docs)) AS avg_ppm
       |  FROM p j JOIN p k ON j.band <= k.band),
       |mn AS (SELECT i.band, a.jb, max(a.avg_ppm) AS m
       |  FROM p i JOIN a ON a.jb <= i.band AND a.kb >= i.band
       |  GROUP BY i.band, a.jb)
       |SELECT p.band, p.n_docs, p.n_dup,
       |  1000000 * p.n_dup // p.n_docs AS dup_ppm_raw,
       |  (SELECT CAST(min(m) AS BIGINT) FROM mn WHERE mn.band = p.band) AS dup_ppm_iso
       |FROM p ORDER BY p.band""".stripMargin) { (spark, dir) =>
    val d = docs(spark, dir)
    val dd = graft.operators.PipelineOps.boilerplateDf(d)
      .filter(col("n_dup") > 0).select(col("doc_id"), lit(true).as("is_dup"))
    val b = graft.operators.TextOps.withQuality(d)
      .select(col("doc_id"), expr("quality_ppm div 100000").as("band"))
      .join(dd, Seq("doc_id"), "left")
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
    isotonicDf(b, "band", "n_docs", "n_dup").orderBy("band")
  }

  // ------------------------------------------------------------------
  // q204: expected calibration error of the quality score
  // ------------------------------------------------------------------

  /** q204: Expected Calibration Error of `quality_ppm` read as a
    * predicted P(clean) — per quality band, the band's mean score
    * (`confidence`) vs its observed clean rate (no duplicated span,
    * q193's flag), and the corpus-level
    * `ECE = Σ n_b·|acc_b − conf_b| / N`. The standard "is the score
    * a probability or just a ranking?" audit that decides whether
    * quality thresholds transfer across sources.
    *
    * Determinism: conf is a truncating integer mean of ppm scores,
    * acc one integer division, the gap an integer |difference|, and
    * the rollup an integer-weighted sum over the ≤11-row band
    * relation — no floats anywhere.
    *
    * Scale shape: the q158/q193 band-histogram shape — one bounded
    * aggregate; windows only over the band relation.
    */
  val q204Ece: QueryDef = QueryDef.sql(
    "q204_ece",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |sp AS (SELECT doc_id, md5(unnest(list_transform(
       |    generate_series(1, len(ws) - ${graft.operators.PipelineOps.SpanWords - 1}),
       |    i -> array_to_string(ws[i:i+${graft.operators.PipelineOps.SpanWords - 1}], ' ')))) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |g AS (SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |dd AS (SELECT DISTINCT sp.doc_id FROM sp JOIN g USING (h)),
       |b AS (SELECT q.quality_ppm // 100000 AS band, count(*) AS n,
       |    CAST(sum(q.quality_ppm) AS BIGINT) AS sq,
       |    CAST(sum(CASE WHEN dd.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
       |  FROM qq q LEFT JOIN dd ON q.doc_id = dd.doc_id GROUP BY band),
       |e AS (SELECT band, n, sq // n AS conf_ppm, 1000000 * n_clean // n AS acc_ppm FROM b)
       |SELECT band, CAST(n AS BIGINT) AS n_docs, conf_ppm, acc_ppm,
       |  abs(acc_ppm - conf_ppm) AS gap_ppm,
       |  CAST(sum(n * abs(acc_ppm - conf_ppm)) OVER () // sum(n) OVER () AS BIGINT) AS ece_ppm
       |FROM e ORDER BY band""".stripMargin) { (spark, dir) =>
    val d = docs(spark, dir)
    val dd = graft.operators.PipelineOps.boilerplateDf(d)
      .filter(col("n_dup") > 0).select(col("doc_id"), lit(true).as("is_dup"))
    val e = graft.operators.TextOps.withQuality(d)
      .select(col("doc_id"), col("quality_ppm"))
      .join(dd, Seq("doc_id"), "left")
      .groupBy(expr("quality_ppm div 100000").as("band"))
      .agg(count(lit(1)).as("n"), sum("quality_ppm").as("sq"),
        sum(when(col("is_dup").isNull, 1L).otherwise(0L)).as("n_clean"))
      .withColumn("conf_ppm", expr("sq div n"))
      .withColumn("acc_ppm", expr("1000000L * n_clean div n"))
    e.select(col("band"), col("n").as("n_docs"), col("conf_ppm"), col("acc_ppm"),
        abs(col("acc_ppm") - col("conf_ppm")).as("gap_ppm"))
      .withColumn("ece_ppm",
        expr("CAST(sum(n_docs * gap_ppm) OVER () div sum(n_docs) OVER () AS BIGINT)"))
      .orderBy("band")
  }

  /** The q193 PAVA fit as a reusable stage over any ordered
    * (bucket, weight, hits) histogram: appends `dup_ppm_raw` and the
    * antitonic `dup_ppm_iso`. All joins are over the bucket histogram
    * — broadcast-sized by construction.
    */
  def isotonicDf(hist: DataFrame, bucket: String, w: String, h: String): DataFrame = {
    val ow = Window.orderBy(bucket)
    val p = hist
      .withColumn("cn", sum(w).over(ow))
      .withColumn("cd", sum(h).over(ow))
    val j = p.select(col(bucket).as("jb"), col("cn").as("jcn"), col("cd").as("jcd"),
      col(w).as("jw"), col(h).as("jh"))
    val k = p.select(col(bucket).as("kb"), col("cn").as("kcn"), col("cd").as("kcd"))
    val a = j.join(k, col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        expr("1000000L * (kcd - (jcd - jh)) div (kcn - (jcn - jw))").as("avg_ppm"))
    val mn = p.select(col(bucket).as("iband")).join(broadcast(a),
        col("jb") <= col("iband") && col("kb") >= col("iband"))
      .groupBy("iband", "jb").agg(max("avg_ppm").as("m"))
    val fit = mn.groupBy("iband").agg(min("m").as("dup_ppm_iso"))
    p.join(broadcast(fit), p(bucket) === fit("iband"))
      .select(col(bucket), col(w), col(h),
        expr(s"1000000L * $h div $w").as("dup_ppm_raw"), col("dup_ppm_iso"))
  }

  // ------------------------------------------------------------------
  // q225: k-fold stability of the quality~length fit
  // ------------------------------------------------------------------

  /** q225: how stable is q191's regression across data? Five md5
    * folds over doc_id; each row reports the model TRAINED ON THE
    * OTHER FOUR folds — computed by subtracting the fold's exact
    * moment sums from the totals (no second scan, no resampling):
    * leave-one-fold-out slope/intercept/R² per fold. Wildly varying
    * slopes mean the "quality rewards length" relationship is driven
    * by a data slice, not the corpus.
    *
    * Scale shape: ONE moment aggregate keyed by fold (map-side
    * combined), totals via a window over the 5-row relation, fits
    * as fixed-order doubles of exact int64 differences.
    */
  val q225FoldStability: QueryDef = QueryDef.sql(
    "q225_fold_stability",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |d AS (SELECT q.doc_id, d.n_chars AS x, CAST(q.quality_ppm AS BIGINT) AS y,
       |    ${graft.functions.TextHash.duckMd5Bucket("q.doc_id", 5L)} AS fold
       |  FROM qq q JOIN documents d ON q.doc_id = d.doc_id),
       |m AS (SELECT fold, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy, sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM d GROUP BY fold),
       |t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS tn,
       |    CAST(sum(sx) OVER () AS BIGINT) AS tsx, CAST(sum(sy) OVER () AS BIGINT) AS tsy,
       |    sum(sxx) OVER () AS tsxx,
       |    sum(sxy) OVER () AS tsxy,
       |    sum(syy) OVER () AS tsyy FROM m),
       |l AS (SELECT fold, tn - n AS n, tsx - sx AS sx, tsy - sy AS sy,
       |    tsxx - sxx AS sxx, tsxy - sxy AS sxy, tsyy - syy AS syy FROM t),
       |e AS (SELECT fold, n, sx, sy,
       |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS a,
       |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS b,
       |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS c FROM l)
       |SELECT fold, CAST(n AS BIGINT) AS n_train,
       |  round(CASE WHEN b <> 0 THEN a / b END, 6) AS slope,
       |  round(CASE WHEN b <> 0 THEN (sy - a / b * sx) / n END, 6) AS intercept,
       |  round(CASE WHEN b <> 0 AND c <> 0 THEN a * a / (b * c) END, 6) AS r2
       |FROM e ORDER BY fold""".stripMargin) { (spark, dir) =>
    val d = graft.operators.TextOps.withQuality(docs(spark, dir))
      .select(col("n_chars").cast("long").as("x"),
        col("quality_ppm").cast("long").as("y"),
        graft.functions.TextHash.md5Bucket(col("doc_id"), 5L).as("fold"))
    val m = d.groupBy("fold").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("CAST(x AS DECIMAL(20,0)) * x")).as("sxx"),
      sum(expr("CAST(x AS DECIMAL(20,0)) * y")).as("sxy"),
      sum(expr("CAST(y AS DECIMAL(20,0)) * y")).as("syy"))
    val w = Window.partitionBy()
    val l = m
      .withColumn("n2", sum("n").over(w) - col("n"))
      .withColumn("sx2", sum("sx").over(w) - col("sx"))
      .withColumn("sy2", sum("sy").over(w) - col("sy"))
      .withColumn("sxx2", sum("sxx").over(w) - col("sxx"))
      .withColumn("sxy2", sum("sxy").over(w) - col("sxy"))
      .withColumn("syy2", sum("syy").over(w) - col("syy"))
      .select(col("fold"), col("n2").as("n"), col("sx2").as("sx"),
        col("sy2").as("sy"), col("sxx2").as("sxx"), col("sxy2").as("sxy"),
        col("syy2").as("syy"))
    // WIDE-INTEGER cross terms: n·Σxy − Σx·Σy computed in
    // DECIMAL(38,0) (HUGEINT in DuckDB) and cast to double AFTER the
    // exact subtraction — the double-product form suffered
    // catastrophic cancellation past 2^53, losing every significant
    // digit exactly in the large-group regime; this stays exact to
    // ~10^38 and both engines convert the same integer identically
    val e = l.select(col("fold"), col("n"), col("sx"), col("sy"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)").as("a"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)").as("b"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)").as("c"))
    e.select(col("fold"), col("n").as("n_train"),
        round(when(col("b") =!= 0, col("a") / col("b")), 6).as("slope"),
        round(when(col("b") =!= 0,
          (col("sy") - col("a") / col("b") * col("sx")) / col("n")), 6).as("intercept"),
        round(when(col("b") =!= 0 && col("c") =!= 0,
          col("a") * col("a") / (col("b") * col("c"))), 6).as("r2"))
      .orderBy("fold")
  }

  val all: Seq[QueryDef] = Seq(
    q150CollocationLift, q151DedupSaturation, q152NgramNovelty,
    q153SourceOverlap, q154MkTrend, q157SeasonalDecompose, q158QualityVsDup,
    q159BpeMerges, q160RetentionCohorts, q162TheilSen, q163DomainXent,
    q164SlidingWau, q166RfmSegments, q167BurstDetect, q172WilsonRank,
    q173ConversionLatency, q174RendezvousShards, q175HllCalibration,
    q176DecayedLtv, q189ChiSquare, q191OlsFit, q193IsotonicCal, q204Ece,
    q225FoldStability)
}
