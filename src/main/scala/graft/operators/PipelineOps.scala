package graft.operators

import graft.QueryDef
import graft.functions.TextHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedDataset

/** Second wave of training-data-pipeline operators: semi-structured
  * extraction, corpus-frequency chunk dedup (CCNet-style), Bloom-set
  * contamination probing, unigram surprisal scoring, temperature
  * mixture weighting, and embedding label centroids.
  *
  * Determinism policy (same as the rest of the engine): every float
  * that feeds a comparison or a hash-checked output is either an
  * exact integer computation (counts, fixed-point quantities,
  * floor-log2 via binary-string length), a correctly-rounded IEEE
  * primitive computed identically on both engines (sqrt, a single
  * division), or rounded after an order-insensitive integer sum.
  */
object PipelineOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.documents(spark, dir)

  /** Semi-structured property extraction: events carry a JSON `props`
    * payload (the reference's annotation JSON is the analogue —
    * annotation_manager + project JSON, SURVEY §2.1); extract a typed
    * field with a JSON-path expression and aggregate it per event
    * type. Pure projection + one hash aggregate; integer sums are
    * exact so no rounding is involved anywhere.
    */
  val q92PropsExtract: QueryDef = QueryDef.sql(
    "q92_props_extract",
    """SELECT event_type, count(*) AS n,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max
      |FROM (SELECT event_type, user_id,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
    graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"),
        sum("k").as("k_sum"), min("k").as("k_min"), max("k").as("k_max"))
      .orderBy("event_type")
  }

  /** CCNet-style corpus-frequency chunk dedup: split each document
    * into fixed 4-word chunks, count each chunk's document frequency
    * across the corpus, and drop chunks appearing in >= 3 documents
    * (boilerplate). Reports per-document kept fraction.
    *
    * Scale shape: explode -> hash-aggregate the chunk relation
    * (map-side combine collapses repeats before the shuffle) ->
    * shuffle join back on the 8-byte chunk hash (NOT the chunk text)
    * -> per-doc re-aggregate. The frequency table is corpus-sized so
    * it is joined, never broadcast/collected.
    */
  val ChunkWords = 4
  val BoilerplateDf = 3

  /** The q93 transform as a reusable corpus stage (also the
    * `Corpus.chunkDedup` facade): per-document chunk census with the
    * corpus-frequency boilerplate cut.
    */
  def chunkDedupDf(corpus: DataFrame, chunkWords: Int = ChunkWords,
      boilerplateDf: Int = BoilerplateDf): DataFrame = {
    val nChunks = ceil(size(col("__ws")) / lit(chunkWords.toDouble)).cast("int")
    val chunkAt = (i: Column) =>
      TextHash.base32(concat_ws(" ",
        slice(col("__ws"), i * chunkWords + 1, lit(chunkWords))))
    val chunks = corpus
      .withColumn("__ws", split(col("text"), " "))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), nChunks - 1), chunkAt)).as("h"))
    val freq = chunks.groupBy("h").agg(countDistinct("doc_id").as("df"))
    chunks.join(freq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("df") < boilerplateDf, 1)).as("n_kept"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_chunks"), 6).as("kept_frac"))
  }

  val q93ChunkDedup: QueryDef = QueryDef.sql(
    "q93_chunk_dedup",
    s"""WITH c AS (SELECT doc_id, unnest(list_transform(
       |    generate_series(1, (len(ws) + ${ChunkWords - 1}) // $ChunkWords),
       |    i -> ${TextHash.duckBase32(
      s"array_to_string(ws[(i-1)*$ChunkWords+1:(i-1)*$ChunkWords+$ChunkWords], ' ')")})) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |f AS (SELECT h, count(DISTINCT doc_id) AS df FROM c GROUP BY h),
       |j AS (SELECT doc_id, count(*) AS n_chunks,
       |    count(*) FILTER (df < $BoilerplateDf) AS n_kept
       |  FROM c JOIN f USING (h) GROUP BY doc_id)
       |SELECT doc_id, n_chunks, n_kept,
       |  round(CAST(n_kept AS DOUBLE) / n_chunks, 6) AS kept_frac
       |FROM j ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    chunkDedupDf(docs(spark, dir)).orderBy("doc_id")
  }

  /** q93 completed to its actionable output: the SCRUBBED corpus.
    * Same 4-word chunk census and corpus doc-frequency cut, but
    * instead of reporting kept fractions it reassembles each
    * document's surviving chunks in original order — the text a
    * training pipeline actually keeps after boilerplate removal
    * (RefinedWeb/CCNet shape: repeated spans die, unique prose
    * survives). Reassembly is `collect_list(struct(pos, chunk))` →
    * `array_sort` → `array_join`, the same order-preserving
    * aggregation as q116's token reassembly; the frequency table
    * joins back on the 8-byte hash, and the chunk text rides the
    * per-doc rows (never the frequency shuffle).
    */
  val q133ChunkScrub: QueryDef = QueryDef.sql(
    "q133_chunk_scrub",
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |c AS (SELECT doc_id, i - 1 AS pos,
       |    array_to_string(ws[(i-1)*$ChunkWords+1:(i-1)*$ChunkWords+$ChunkWords], ' ') AS chunk
       |  FROM w, unnest(generate_series(1, (len(ws) + ${ChunkWords - 1}) // $ChunkWords)) AS t(i)),
       |ch AS (SELECT doc_id, pos, chunk, ${TextHash.duckBase32("chunk")} AS h FROM c),
       |f AS (SELECT h, count(DISTINCT doc_id) AS df FROM ch GROUP BY h)
       |SELECT ch.doc_id,
       |  coalesce(string_agg(CASE WHEN f.df < $BoilerplateDf THEN ch.chunk END,
       |    ' ' ORDER BY ch.pos), '') AS clean_text,
       |  CAST(count(CASE WHEN f.df >= $BoilerplateDf THEN 1 END) AS BIGINT) AS n_dropped
       |FROM ch JOIN f USING (h)
       |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin) { (spark, dir) =>
    val nChunks = ceil(size(col("__ws")) / lit(ChunkWords.toDouble)).cast("int")
    val chunkTextAt = (i: Column) =>
      concat_ws(" ", slice(col("__ws"), i * ChunkWords + 1, lit(ChunkWords)))
    val chunks = docs(spark, dir)
      .withColumn("__ws", split(col("text"), " "))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1), chunkTextAt))
          .as(Seq("pos", "chunk")))
      .withColumn("h", TextHash.base32(col("chunk")))
    val freq = chunks.groupBy("h").agg(countDistinct("doc_id").as("df"))
    chunks.join(freq, "h")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("df") < BoilerplateDf,
            struct(col("pos"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"),
        count(when(col("df") >= BoilerplateDf, 1)).as("n_dropped"))
      .orderBy("doc_id")
  }

  /** Bloom-filter contamination probe: the scale path of q77. The
    * benchmark set's shingles are folded into a Bloom bit-set
    * (m = 2^16 positions, 3 affine hashes over the shared 32-bit base
    * hash); the corpus is scanned once, each shingle probing all 3
    * positions — a shingle "hits" iff every position is set, so false
    * positives are possible (honest Bloom semantics) but misses are
    * not. At 100 TB the positions relation is a fixed 2^16-row
    * broadcast regardless of benchmark size, where q77's exact
    * shingle set grows with the benchmark.
    *
    * Everything is integer arithmetic — hash, positions, counts — so
    * both engines agree bit-for-bit.
    */
  val BloomBits = 65536L

  val q94BloomContamination: QueryDef = {
    val ps = TextHash.perms.take(3)
    def duckPos(h: String) = ps.map { case (_, a, b) =>
      s"($a * $h + $b) % ${TextHash.Prime} % $BloomBits" }
    QueryDef.sql(
      "q94_bloom_contamination",
      s"""WITH ${TextHash.duckShingleCte()},
         |d AS (SELECT doc_id, h FROM (SELECT doc_id, list_distinct(list(h)) AS hs
         |    FROM sh GROUP BY doc_id), unnest(hs) AS u(h)),
         |pos AS (SELECT DISTINCT unnest([${duckPos("h").mkString(", ")}]) AS p
         |  FROM d WHERE doc_id % 50 = 0),
         |pr AS (SELECT doc_id, h, unnest([${duckPos("h").mkString(", ")}]) AS p
         |  FROM d WHERE doc_id % 50 <> 0),
         |m AS (SELECT doc_id, h, count(pos.p) AS nm
         |  FROM pr LEFT JOIN pos USING (p) GROUP BY doc_id, h),
         |r AS (SELECT doc_id, count(*) AS n_sh,
         |    count(*) FILTER (nm = 3) AS n_bloom FROM m GROUP BY doc_id)
         |SELECT doc_id, n_sh, n_bloom FROM r WHERE n_bloom > 0
         |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val posArr = (h: Column) => array(ps.map { case (_, a, b) =>
        (lit(a) * h + lit(b)) % TextHash.Prime % BloomBits }: _*)
      val sh = docs(spark, dir)
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"),
          explode(array_distinct(TextHash.shingleHashesFromWords(col("ws")))).as("h"))
      val positions = sh.filter(col("doc_id") % 50 === 0)
        .select(explode(posArr(col("h"))).as("p")).distinct()
        .withColumn("set", lit(1))
      sh.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), col("h"), explode(posArr(col("h"))).as("p"))
        .join(broadcast(positions), Seq("p"), "left")
        .groupBy("doc_id", "h")
        .agg(count(col("set")).as("nm"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"), count(when(col("nm") === 3, 1)).as("n_bloom"))
        .filter(col("n_bloom") > 0)
        .orderBy("doc_id")
    }
  }

  /** Unigram surprisal scoring — the cheap LM-quality signal: a
    * document's mean per-token surprisal against the corpus unigram
    * distribution. Surprisal is measured in EXACT integer bits,
    * floor(log2(T / cnt)) computed as the bit-length of the integer
    * quotient (binary-string length - 1) — no floating log anywhere,
    * so the score is reproducible bit-for-bit on any engine and any
    * reduction order. High mean surprisal = rare-token gibberish; low
    * = boilerplate.
    *
    * Scale shape: one explode + map-side-combined vocab aggregate,
    * one one-row total broadcast, one shuffle join of tokens to vocab
    * on the token key, one per-doc aggregate. The vocab relation is
    * heavy-tailed but ~1e8 rows at web scale — it stays distributed
    * (joined, not collected).
    */
  /** The q95 transform as a reusable corpus stage (also the
    * `Corpus.surprisalBits` facade). `persistVocab` caches the vocab
    * aggregate so its two consumers (the 1-row total and the bits
    * join) share one tokenization scan — the harness clears caches
    * per query; facade callers default to the uncached lazy plan and
    * persist at their own scope.
    */
  def surprisalBitsDf(corpus: DataFrame, persistVocab: Boolean = false): DataFrame = {
    val toks = corpus.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val vocabBase = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val vocab = if (persistVocab) vocabBase.scopedPersist() else vocabBase
    val total = vocab.agg(sum("cnt").as("total"))
    val bits = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        (length(bin(expr("total div cnt"))) - 1).cast("long").as("bits"))
    toks.join(bits, "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("bits").as("bits_sum"))
      .select(col("doc_id"), col("n_tokens"), col("bits_sum"),
        round(col("bits_sum").cast("double") / col("n_tokens"), 6).as("avg_bits"))
  }

  val q95SurprisalBits: QueryDef = QueryDef.sql(
    "q95_surprisal_bits",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |v AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
      |b AS (SELECT token, length(printf('%b', total // cnt)) - 1 AS bits FROM v, tot),
      |d AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(bits) AS BIGINT) AS bits_sum
      |  FROM t JOIN b USING (token) GROUP BY doc_id)
      |SELECT doc_id, n_tokens, bits_sum,
      |  round(CAST(bits_sum AS DOUBLE) / n_tokens, 6) AS avg_bits
      |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    surprisalBitsDf(docs(spark, dir), persistVocab = true).orderBy("doc_id")
  }

  /** DSIR-style importance weighting for targeted data selection
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", arXiv 2302.03169): score every document by the
    * log-likelihood ratio of its tokens under a TARGET domain's
    * unigram distribution (here lang='en', the corpus' majority
    * class) versus the whole-corpus distribution, then rank for
    * selection. Documents whose vocabulary looks like the target
    * float to the top; the rank order is exactly the importance-
    * resampling order DSIR samples from.
    *
    * Like q95, the per-token log is EXACT integer bits — the
    * bit-length of the Laplace-smoothed integer quotient
    * `(T + V) div (c + 1)` — so the ratio
    * `delta = floor_log2(corpus quotient) - floor_log2(target
    * quotient)` is reproducible bit-for-bit on any engine and any
    * reduction order (the repo's log-free policy; documented
    * deviation from DSIR's float n-gram LM).
    *
    * Scale shape (q95's, plus a bounded top-k): ONE tokenization
    * scan feeds a map-side-combined vocab aggregate counting both
    * distributions at once (no second corpus pass for the target —
    * it is a filtered count over the same groups); the totals are a
    * 1-row broadcast; the bits relation joins back to tokens on the
    * token key (distributed, never collected); the final ranking is
    * a TakeOrderedAndProject(50) — no global sort materializes.
    */
  val q232DsirWeights: QueryDef = QueryDef.sql(
    "q232_dsir_weights",
    """WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
      |v AS (SELECT token, count(*) AS c_all,
      |    count(*) FILTER (lang = 'en') AS c_tgt FROM t GROUP BY token),
      |tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS t_all,
      |    CAST(sum(c_tgt) AS BIGINT) AS t_tgt, count(*) AS nv FROM v),
      |b AS (SELECT token,
      |    (length(printf('%b', (t_all + nv) // (c_all + 1))) - 1)
      |  - (length(printf('%b', (t_tgt + nv) // (c_tgt + 1))) - 1) AS delta_bits
      |  FROM v, tot),
      |d AS (SELECT doc_id, count(*) AS n_tokens,
      |    CAST(sum(delta_bits) AS BIGINT) AS llr_bits
      |  FROM t JOIN b USING (token) GROUP BY doc_id)
      |SELECT d.doc_id, lang, source, n_tokens, llr_bits
      |FROM d JOIN documents USING (doc_id)
      |ORDER BY llr_bits DESC, d.doc_id LIMIT 50""".stripMargin) { (spark, dir) =>
    val d = docs(spark, dir)
    val toks = d.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("token"))
    // one group-by counts BOTH distributions (target = filtered count)
    val vocab = toks.groupBy("token")
      .agg(count(lit(1)).as("c_all"),
        count(when(col("lang") === "en", 1)).as("c_tgt"))
      .scopedPersist() // two consumers: the 1-row total and the bits join
    val tot = vocab.agg(sum("c_all").as("t_all"), sum("c_tgt").as("t_tgt"),
      count(lit(1)).as("nv"))
    val bits = vocab.crossJoin(broadcast(tot))
      .select(col("token"),
        ((length(bin(expr("(t_all + nv) div (c_all + 1)"))) - 1)
          - (length(bin(expr("(t_tgt + nv) div (c_tgt + 1)"))) - 1))
          .cast("long").as("delta_bits"))
    toks.join(bits, "token")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("delta_bits").as("llr_bits"))
      .join(d.select("doc_id", "lang", "source"), "doc_id")
      .select("doc_id", "lang", "source", "n_tokens", "llr_bits")
      .orderBy(col("llr_bits").desc, col("doc_id"))
      .limit(50)
  }

  /** Temperature-weighted mixture sampling (alpha = 0.5): per-source
    * sampling weights proportional to sqrt(token count) — the
    * standard low-resource up-weighting — realized as exact
    * parts-per-million rates, then applied with the md5-bucket
    * deterministic sampler. sqrt is IEEE-correctly-rounded (bit-equal
    * on both engines); the weight normalization is integer fixed
    * point end-to-end, so rates and membership are exactly
    * reproducible.
    *
    * Overflow bound: weights quantize at MILLI resolution
    * (`round(sqrt(n)·1e3)`), so the `wq · 1e6` numerator stays under
    * 2^63 up to ~8.5e19 tokens per source — six orders of magnitude
    * past a 100 TB corpus. (Micro resolution would wrap at ~8.5e13,
    * inside the advertised scale.)
    *
    * Scale shape: per-source totals are a tiny aggregate broadcast
    * back onto the corpus projection; sampling stays a pure per-row
    * predicate (no shuffle beyond the final per-source rollup).
    */
  def mixtureRatesDf(corpus: DataFrame): DataFrame =
    corpus
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("wq", round(sqrt(col("n_tokens").cast("double")) * 1e3).cast("long"))
      // normalization = window over the ALREADY-AGGREGATED per-source
      // relation (|sources| rows — trivially one partition), not a
      // crossJoin against a second aggregation lineage: one corpus
      // scan builds the rate table
      .withColumn("wt", sum("wq").over(Window.partitionBy()))
      .withColumn("rate_ppm", expr("wq * 1000000 div wt"))
      .select("source", "n_docs", "n_tokens", "rate_ppm")

  val q96MixtureSample: QueryDef = QueryDef.sql(
    "q96_mixture_sample",
    s"""WITH s AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |w AS (SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e3) AS BIGINT) AS wq FROM s),
       |r AS (SELECT *, CAST(wq * 1000000 // (SELECT CAST(sum(wq) AS BIGINT) FROM w) AS BIGINT) AS rate_ppm FROM w),
       |k AS (SELECT d.source, count(*) AS n_sampled
       |  FROM documents d JOIN r ON d.source = r.source
       |  WHERE ${TextHash.duckMd5Bucket("d.doc_id", 1000000L)} < r.rate_ppm
       |  GROUP BY d.source)
       |SELECT r.source, n_docs, n_tokens, rate_ppm,
       |  coalesce(n_sampled, 0) AS n_sampled
       |FROM r LEFT JOIN k ON r.source = k.source
       |ORDER BY r.source""".stripMargin) { (spark, dir) =>
    val d = docs(spark, dir)
    // persisted: two consumers (the sampler join and the final report)
    // would otherwise each re-run the rate scan; Bench/Verify clear
    // caches per query
    val rates = mixtureRatesDf(d).scopedPersist()
    val sampled = d
      .join(broadcast(rates.select("source", "rate_ppm")), "source")
      .filter(TextHash.md5Bucket(col("doc_id"), 1000000L) < col("rate_ppm"))
      .groupBy("source").agg(count(lit(1)).as("n_sampled"))
    rates.join(sampled, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("rate_ppm"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy("source")
  }

  /** Per-label embedding centroids — the k-means M-step / class
    * prototype primitive. Embeddings explode to (label, dim, value)
    * long form; components quantize to integer micro-units BEFORE the
    * sum so the centroid is independent of reduction order, then one
    * hash aggregate per (label, dim) computes the mean.
    *
    * Scale shape: posexplode + hash aggregate = one shuffle of
    * (n_vectors x dims) narrow rows with map-side partial sums; no
    * window, no collect. The float->double cast and the 1e6 scaling
    * are exact IEEE ops, identical on both engines.
    */
  val q97LabelCentroids: QueryDef = QueryDef.sql(
    "q97_label_centroids",
    """SELECT label, CAST(i - 1 AS BIGINT) AS dim, count(*) AS n,
      |  round(CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
      |    / count(*) / 1e6, 6) AS centroid
      |FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
      |GROUP BY label, dim ORDER BY label, dim""".stripMargin) { (spark, dir) =>
    graft.sources.Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * 1e6).cast("long").as("q"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"),
        round(sum("q").cast("double") / count(lit(1)) / 1e6, 6).as("centroid"))
      .orderBy("label", "dim")
  }

  /** Per-series lag-1 autocorrelation — the signal-regularity score a
    * trimming pipeline uses to spot dead/noisy channels (reference's
    * suggestion heuristics are derivative-threshold cousins,
    * main.py:1279-1308). Pearson r over (x_t, x_{t-1}) pairs from
    * EXACT integer moments: values quantize to milli-units, the six
    * sums (n, Sx, Sy, Sxx, Syy, Sxy) are overflow-checked bigints
    * (|q| <= 5.6e5 here => n·q² < 2^63 up to ~29M rows/series), and
    * the final r is one shared IEEE expression over exact inputs —
    * bit-identical on any engine at any reduction order.
    *
    * One shuffle: the lag window and the per-user aggregate share the
    * user_id partitioning.
    */
  val q98Autocorr: QueryDef = QueryDef.sql(
    "q98_autocorr",
    s"""WITH s AS (SELECT user_id, event_id,
       |    t - min(t) OVER (PARTITION BY user_id) AS tn,
       |    CAST(round(value * 1000.0) AS BIGINT) AS q
       |  FROM (${graft.sources.Tables.seriesSql})),
       |p AS (SELECT user_id, q AS x,
       |    lag(q) OVER (PARTITION BY user_id ORDER BY tn, event_id) AS y FROM s),
       |m AS (SELECT user_id, count(*) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(y AS HUGEINT) * y) AS syy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM p WHERE y IS NOT NULL GROUP BY user_id)
       |, e AS (SELECT user_id, n,
       |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
       |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS dx,
       |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS dy
       |  FROM m WHERE n >= 2)
       |SELECT user_id, n AS n_pairs,
       |  CASE WHEN dx = 0 OR dy = 0 THEN NULL
       |       ELSE round(num / (sqrt(dx) * sqrt(dy)), 6) END AS r
       |FROM e ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val byUser = Window.partitionBy("user_id")
    val ordered = Window.partitionBy("user_id").orderBy("tn", "event_id")
    val p = graft.sources.Tables.series(spark, dir)
      .withColumn("tn", col("t") - min("t").over(byUser))
      .withColumn("x", round(col("value") * 1e3).cast("long"))
      .withColumn("y", lag("x", 1).over(ordered))
      .filter(col("y").isNotNull)
    val m = p.groupBy("user_id").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("CAST(x AS DECIMAL(20,0)) * x")).as("sxx"),
      sum(expr("CAST(y AS DECIMAL(20,0)) * y")).as("syy"),
      sum(expr("CAST(x AS DECIMAL(20,0)) * y")).as("sxy"))
    // wide-integer cross terms (olsFitDf's policy): exact
    // DECIMAL(38,0) subtraction, cast to double after
    val dx = expr(
      "CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)")
    val dy = expr(
      "CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)")
    val num = expr(
      "CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)")
    m.filter(col("n") >= 2)
      .select(col("user_id"), col("n").as("n_pairs"),
        when(dx === 0 || dy === 0, lit(null))
          .otherwise(round(num / (sqrt(dx) * sqrt(dy)), 6)).as("r"))
      .orderBy("user_id")
  }

  /** q98 generalized to the autocorrelation FUNCTION: Pearson r at
    * lags 1..5 per series, the dead/periodic-channel diagnostic (an
    * ACF that stays ≈1 across lags = stuck sensor; oscillating sign =
    * periodicity at that lag). Same exact-integer-moment determinism
    * as q98; the five lag columns ride ONE window pass on the series
    * shuffle, then `stack` unpivots them so a single hash aggregate
    * computes all five lags' moments — no per-lag re-scan, no self
    * join (the naive per-lag formulation is five windows + five
    * aggregates over the same exchange).
    */
  val q114Acf: QueryDef = {
    val maxLag = 5
    val lagSqls = (1 to maxLag).map(l =>
      s"SELECT user_id, $l AS lag, q AS x, lag(q, $l) OVER (PARTITION BY user_id ORDER BY tn, event_id) AS y FROM s")
    QueryDef.sql(
      "q114_acf",
      s"""WITH s AS (SELECT user_id, event_id,
         |    t - min(t) OVER (PARTITION BY user_id) AS tn,
         |    CAST(round(value * 1000.0) AS BIGINT) AS q
         |  FROM (${graft.sources.Tables.seriesSql})),
         |p AS (${lagSqls.mkString("\nUNION ALL\n")}),
         |m AS (SELECT user_id, lag, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(y AS HUGEINT) * y) AS syy,
         |    sum(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM p WHERE y IS NOT NULL GROUP BY user_id, lag)
         |, e AS (SELECT user_id, lag, n,
         |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
         |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS dx,
         |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS dy
         |  FROM m WHERE n >= 2)
         |SELECT user_id, CAST(lag AS BIGINT) AS lag, n AS n_pairs,
         |  CASE WHEN dx = 0 OR dy = 0 THEN NULL
         |       ELSE round(num / (sqrt(dx) * sqrt(dy)), 6) END AS r
         |FROM e ORDER BY user_id, lag""".stripMargin) { (spark, dir) =>
      val byUser = Window.partitionBy("user_id")
      val ordered = Window.partitionBy("user_id").orderBy("tn", "event_id")
      var p = graft.sources.Tables.series(spark, dir)
        .withColumn("tn", col("t") - min("t").over(byUser))
        .withColumn("x", round(col("value") * 1e3).cast("long"))
      (1 to maxLag).foreach(l => p = p.withColumn(s"y$l", lag("x", l).over(ordered)))
      val stackExpr = (1 to maxLag).map(l => s"${l}L, y$l").mkString(", ")
      val stacked = p.selectExpr("user_id", "x",
          s"stack($maxLag, $stackExpr) AS (lag, y)")
        .filter(col("y").isNotNull)
      val m = stacked.groupBy("user_id", "lag").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(20,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(20,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(20,0)) * y")).as("sxy"))
      // cast-before-product: see q98's note (same overflow class)
      val dx = expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)")
      val dy = expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)")
      val num = expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)")
      m.filter(col("n") >= 2)
        .select(col("user_id"), col("lag"), col("n").as("n_pairs"),
          when(dx === 0 || dy === 0, lit(null))
            .otherwise(round(num / (sqrt(dx) * sqrt(dy)), 6)).as("r"))
        .orderBy("user_id", "lag")
    }
  }

  /** Bigram surprisal — the next step up from q95's unigram score and
    * the cheap stand-in for CCNet-style LM-perplexity filtering: a
    * document's mean `-log2 P(w_i | w_{i-1})` against the corpus
    * bigram distribution, in EXACT integer bits
    * (`floor(log2(c1/c2))` as the bit length of the integer quotient
    * of the context count over the bigram count) — no floating log,
    * reproducible at any reduction order.
    *
    * Scale shape: one tokenize + per-doc lag window (doc_id shuffle),
    * one map-side-combined bigram aggregate, a tiny context rollup of
    * that aggregate, one shuffle join of doc bigrams to bigram bits
    * on the (prev, token) key, one per-doc aggregate. The bigram
    * relation stays distributed (joined, never collected); its
    * context rollup reuses the bigram partials rather than re-scanning
    * tokens.
    */
  val q115BigramSurprisal: QueryDef = QueryDef.sql(
    "q115_bigram_surprisal",
    """WITH t AS (SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS token,
      |    unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      |  FROM documents),
      |b AS (SELECT doc_id, lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
      |    token FROM t QUALIFY prev IS NOT NULL),
      |c2 AS (SELECT prev, token, count(*) AS c2 FROM b GROUP BY prev, token),
      |c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY prev),
      |bits AS (SELECT c2.prev, c2.token,
      |    length(printf('%b', c1 // c2)) - 1 AS bits
      |  FROM c2 JOIN c1 USING (prev)),
      |d AS (SELECT doc_id, count(*) AS n_bigrams,
      |    CAST(sum(bits) AS BIGINT) AS bits_sum
      |  FROM b JOIN bits USING (prev, token) GROUP BY doc_id)
      |SELECT doc_id, n_bigrams, bits_sum,
      |  round(CAST(bits_sum AS DOUBLE) / n_bigrams, 6) AS avg_bits
      |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val toks = docs(spark, dir).select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // persisted: two consumers (the count aggregate and the final
    // scoring join) would each re-run tokenize + lag window; the
    // harness clears caches per query. At 100 TB this cache becomes
    // an explicit parquet materialization of the bigram relation.
    val bi = toks.withColumn("prev", lag("token", 1).over(w))
      .filter(col("prev").isNotNull)
      .select("doc_id", "prev", "token")
      .scopedPersistEager()
    val c2 = bi.groupBy("prev", "token").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("prev").agg(sum("c2").as("c1"))
    val bits = c2.join(c1, "prev").select(col("prev"), col("token"),
      (length(bin(expr("c1 div c2"))) - 1).cast("long").as("bits"))
    bi.join(bits, Seq("prev", "token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("bits_sum"))
      .select(col("doc_id"), col("n_bigrams"), col("bits_sum"),
        round(col("bits_sum").cast("double") / col("n_bigrams"), 6).as("avg_bits"))
      .orderBy("doc_id")
  }

  /** Funnel analysis: how far each user progresses through
    * view -> click (within 12 h of the first view) -> purchase
    * (within 3 days of that click), plus the mean view->purchase
    * latency of full converters. Stage timestamps are conditional
    * partition-window minima riding ONE user_id shuffle; the latency
    * mean is an order-insensitive integer micro-unit sum. All
    * comparisons are on the shared bit-exact time axis, so both
    * engines agree exactly.
    */
  val ClickWindowSec = 43200.0
  val BuyWindowSec = 259200.0

  val q99Funnel: QueryDef = QueryDef.sql(
    "q99_funnel",
    s"""WITH s AS (SELECT user_id, event_type,
       |    t - min(t) OVER (PARTITION BY user_id) AS tn
       |  FROM (${graft.sources.Tables.seriesSql})),
       |v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tn END)
       |    OVER (PARTITION BY user_id) AS t_view FROM s),
       |c AS (SELECT *, min(CASE WHEN event_type = 'click' AND tn > t_view
       |    AND tn <= t_view + $ClickWindowSec THEN tn END)
       |    OVER (PARTITION BY user_id) AS t_click FROM v),
       |p AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tn > t_click
       |    AND tn <= t_click + $BuyWindowSec THEN tn END)
       |    OVER (PARTITION BY user_id) AS t_buy FROM c),
       |u AS (SELECT DISTINCT user_id, t_view, t_click, t_buy FROM p),
       |g AS (SELECT user_id,
       |    CASE WHEN t_buy IS NOT NULL THEN 3 WHEN t_click IS NOT NULL THEN 2
       |         WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS stage,
       |    t_buy - t_view AS conv FROM u)
       |SELECT stage, count(*) AS n_users,
       |  round(CAST(sum(CAST(round(conv * 1e6) AS BIGINT)) AS DOUBLE)
       |    / count(conv) / 1e6, 6) AS avg_convert_sec
       |FROM g GROUP BY stage ORDER BY stage""".stripMargin) { (spark, dir) =>
    val byUser = Window.partitionBy("user_id")
    val staged = graft.sources.Tables.seriesNorm(spark, dir)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("tn"))).over(byUser))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("tn") > col("t_view")
          && col("tn") <= col("t_view") + ClickWindowSec, col("tn"))).over(byUser))
      .withColumn("t_buy",
        min(when(col("event_type") === "purchase" && col("tn") > col("t_click")
          && col("tn") <= col("t_click") + BuyWindowSec, col("tn"))).over(byUser))
      .select("user_id", "t_view", "t_click", "t_buy").distinct()
      .withColumn("stage",
        when(col("t_buy").isNotNull, 3).when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1).otherwise(0))
      .withColumn("conv", col("t_buy") - col("t_view"))
    staged.groupBy("stage")
      .agg(count(lit(1)).as("n_users"),
        round(sum(round(col("conv") * 1e6).cast("long")).cast("double")
          / count(col("conv")) / 1e6, 6).as("avg_convert_sec"))
      .orderBy("stage")
  }

  /** Cross-document repeated-span detection — the exact-substring
    * dedup primitive (the suffix-array approach's distributable
    * cousin): every 8-word span is keyed by its full 128-bit md5;
    * spans appearing in >= 2 distinct documents come back with the
    * occurrence census and an exactness witness (min(span) = max(span)
    * inside the hash group proves all group members are the identical
    * string, so a hash collision cannot masquerade as a duplicate).
    *
    * Scale shape: explode -> one hash aggregate keyed on the 32-char
    * digest with map-side combine; no self-join, no pair explosion.
    */
  val SpanWords = 8

  /** The q100 census as a reusable corpus stage (also the
    * `Corpus.repeatedSpans` facade).
    */
  def repeatedSpansDf(corpus: DataFrame, spanWords: Int = SpanWords): DataFrame =
    corpus
      .withColumn("__ws", split(col("text"), " "))
      .select(col("doc_id"),
        explode(TextHash.shinglesFromWords(col("__ws"), spanWords)).as("span"))
      // shuffle fixed-width digests, never the span strings: at 100 TB
      // the exploded spans are ~10x the corpus bytes, and even at sf0.1
      // shuffling them through the aggregate GC-thrashed (measured
      // 2.5-14 s run-to-run; digests: stable ~1.5 s). `exact` keeps its
      // collision-check meaning via a second, independent digest —
      // min=max of md5('#'+span) within an md5(span) bucket certifies
      // all occurrences are the same span up to a double-md5 collision.
      .select(col("doc_id"), md5(col("span")).as("h"),
        md5(concat(lit("#"), col("span"))).as("h2"))
      .groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occur"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
        (min("h2") === max("h2")).as("exact"))
      .filter(col("n_docs") >= 2)

  val q100RepeatedSpans: QueryDef = QueryDef.sql(
    "q100_repeated_spans",
    s"""WITH sp AS (SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(ws) - ${SpanWords - 1}),
       |    i -> array_to_string(ws[i:i+${SpanWords - 1}], ' '))) AS span
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |g AS (SELECT md5(span) AS h, count(DISTINCT doc_id) AS n_docs,
       |    count(*) AS n_occur, min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |    (min(md5('#' || span)) = max(md5('#' || span))) AS exact
       |  FROM sp GROUP BY md5(span))
       |SELECT h, n_docs, n_occur, first_doc, last_doc, exact
       |FROM g WHERE n_docs >= 2 ORDER BY h""".stripMargin) { (spark, dir) =>
    repeatedSpansDf(docs(spark, dir)).orderBy("h")
  }

  /** Per-source quantile rank of document quality — the balanced-
    * filtering primitive (keep the top X% of EACH source rather than
    * a global bar that empties low-quality sources). `percent_rank`
    * is `(rank-1)/(n-1)`: integers in, one IEEE division out —
    * deterministic, tie-stable (ties share a rank on both engines).
    *
    * Scale shape: `source` is low-cardinality, so
    * `percent_rank().over(partitionBy(source))` would sort each
    * source's ENTIRE doc population on one reducer. Instead the rank
    * is read off a per-(source, quality_ppm) count histogram:
    * `rank−1` = docs with a strictly smaller ppm = the prefix sum of
    * the histogram, and `(rank−1)/(n−1)` is the same single IEEE
    * division PercentRank evaluates — bit-identical output, zero
    * single-reducer sorts. The histogram is bounded by the VALUE
    * DOMAIN (|sources| × 1e6 ppm values), not the corpus size, so
    * broadcasting it back is a bounded-size build side at any scale;
    * the doc-side scan never shuffles at all.
    */
  val q107QualityRank: QueryDef = QueryDef.sql(
    "q107_quality_rank",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |d AS (SELECT q.doc_id, d.source, q.quality_ppm
       |  FROM qq q JOIN documents d ON q.doc_id = d.doc_id)
       |SELECT doc_id, source, CAST(quality_ppm AS BIGINT) AS quality_ppm,
       |  percent_rank() OVER (PARTITION BY source ORDER BY quality_ppm) AS qrank
       |FROM d ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val scored = graft.operators.TextOps.withQuality(docs(spark, dir))
      .select(col("doc_id"), col("source"), col("quality_ppm"))
    val wOrd = Window.partitionBy("source").orderBy("quality_ppm")
    val ranks = scored.groupBy("source", "quality_ppm").agg(count(lit(1)).as("cnt"))
      .withColumn("rank0", coalesce(
        sum("cnt").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("cnt").over(Window.partitionBy("source")))
      // PercentRank's guard + division, verbatim: n ≤ 1 → 0.0
      .withColumn("qrank", when(col("n") > 1,
        col("rank0").cast("double") / (col("n") - 1).cast("double")).otherwise(lit(0.0)))
      .select("source", "quality_ppm", "qrank")
    scored.join(broadcast(ranks), Seq("source", "quality_ppm"))
      .select("doc_id", "source", "quality_ppm", "qrank")
      .orderBy("doc_id")
  }

  /** q188: reciprocal-rank fusion of two document rankings (quality
    * score vs length) — the standard ensemble step when multiple
    * retrieval/filter signals must agree (Cormack et al., SIGIR'09):
    * `rrf = Σ 1/(60 + rank_i)`, emitted as exact integer ppm
    * (`1e6 div (60+r)` per signal).
    *
    * Scale shape: both ranks are read off VALUE-HISTOGRAM prefix sums
    * (the q107 trick — rank = 1 + docs with a strictly better
    * integer score, computed on the bounded (value, count) histogram
    * and broadcast-joined back), so the global `rank()` never sorts
    * doc rows on one reducer; the histogram window is bounded by the
    * score DOMAIN, not the corpus.
    */
  val q188RrfFusion: QueryDef = QueryDef.sql(
    "q188_rrf_fusion",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |d AS (SELECT q.doc_id, CAST(q.quality_ppm AS BIGINT) AS quality_ppm,
       |    d.n_chars FROM qq q JOIN documents d ON q.doc_id = d.doc_id),
       |r AS (SELECT doc_id, quality_ppm, n_chars,
       |    rank() OVER (ORDER BY quality_ppm DESC) AS rq,
       |    rank() OVER (ORDER BY n_chars DESC) AS rl
       |  FROM d)
       |SELECT doc_id, CAST(rq AS BIGINT) AS rq, CAST(rl AS BIGINT) AS rl,
       |  1000000 // (60 + rq) + 1000000 // (60 + rl) AS rrf_ppm
       |FROM r ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val scored = graft.operators.TextOps.withQuality(docs(spark, dir))
      .select(col("doc_id"), col("quality_ppm"), col("n_chars"))
    // histogram rank: 1 + count of docs with a strictly greater score;
    // the unpartitioned window runs over the BOUNDED histogram only
    def histRank(scoreCol: String): DataFrame = {
      val w = Window.orderBy(col(scoreCol).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      scored.groupBy(scoreCol).agg(count(lit(1)).as("cnt"))
        .withColumn("r", coalesce(sum("cnt").over(w), lit(0L)) + 1L)
        .select(col(scoreCol), col("r"))
    }
    scored
      .join(broadcast(histRank("quality_ppm").withColumnRenamed("r", "rq")),
        Seq("quality_ppm"))
      .join(broadcast(histRank("n_chars").withColumnRenamed("r", "rl")),
        Seq("n_chars"))
      .select(col("doc_id"), col("rq"), col("rl"),
        (expr("1000000L div (60 + rq)") + expr("1000000L div (60 + rl)")).as("rrf_ppm"))
      .orderBy("doc_id")
  }

  /** q203: quantile normalization of the quality score across
    * sources — each document's score is replaced by the POOLED
    * distribution's value at the document's within-source
    * percentile, the batch-effect correction that makes one quality
    * bar comparable across differently-scored sources (the
    * bioinformatics quantile-normalize, applied to corpus curation).
    *
    * Determinism: the within-source percentile is PercentRank's
    * exact `(rank−1)/(n−1)` (computed histogram-side, q107), the
    * pooled lookup replays q108's bracketing interpolation on the
    * global value histogram — every input integer-exact, every
    * double expression fixed-order, one shared round.
    *
    * Scale shape: per-source ranks come from the bounded
    * (source, ppm) histogram (q107 — no per-source row sort); the
    * pooled histogram is value-domain-bounded and BROADCAST to the
    * doc scan for the two bracket lookups, so the doc side never
    * shuffles beyond the rank join.
    */
  val q203QuantileNormalize: QueryDef = QueryDef.sql(
    "q203_quantile_normalize",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |d AS (SELECT q.doc_id, dd.source, CAST(q.quality_ppm AS BIGINT) AS qp
       |  FROM qq q JOIN documents dd ON q.doc_id = dd.doc_id),
       |r AS (SELECT *, percent_rank() OVER (PARTITION BY source ORDER BY qp) AS p FROM d),
       |g AS (SELECT qp AS v, count(*) AS c FROM d GROUP BY qp),
       |gc AS (SELECT *, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER () AS BIGINT) AS ng FROM g),
       |x AS (SELECT r.*, r.p * ((SELECT max(ng) FROM gc) - 1) AS pos FROM r),
       |lo AS (SELECT x.doc_id, gc.v AS vlo FROM x JOIN gc
       |  ON gc.cum - gc.c <= floor(x.pos) AND floor(x.pos) < gc.cum),
       |hi AS (SELECT x.doc_id, gc.v AS vhi FROM x JOIN gc
       |  ON gc.cum - gc.c <= ceil(x.pos) AND ceil(x.pos) < gc.cum)
       |SELECT x.doc_id, x.source, x.qp AS quality_ppm,
       |  round(CASE WHEN floor(x.pos) = ceil(x.pos) OR lo.vlo = hi.vhi
       |    THEN CAST(lo.vlo AS DOUBLE)
       |    ELSE (ceil(x.pos) - x.pos) * lo.vlo + (x.pos - floor(x.pos)) * hi.vhi
       |    END, 6) AS qnorm
       |FROM x JOIN lo USING (doc_id) JOIN hi USING (doc_id)
       |ORDER BY x.doc_id""".stripMargin) { (spark, dir) =>
    val d = graft.operators.TextOps.withQuality(docs(spark, dir))
      .select(col("doc_id"), col("source"), col("quality_ppm").cast("long").as("qp"))
    // within-source percent_rank off the bounded histogram (q107)
    val sw = Window.partitionBy("source").orderBy("qp")
    val ranks = d.groupBy("source", "qp").agg(count(lit(1)).as("cnt"))
      .withColumn("rank0", coalesce(
        sum("cnt").over(sw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("ns", sum("cnt").over(Window.partitionBy("source")))
      .withColumn("p", when(col("ns") > 1,
        col("rank0").cast("double") / (col("ns") - 1).cast("double")).otherwise(lit(0.0)))
      .select("source", "qp", "p")
    // pooled histogram with bracketing rows (q108)
    val gc = d.groupBy(col("qp").as("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("v")))
      .withColumn("ng", sum("c").over(Window.partitionBy()))
    val x = d.join(broadcast(ranks), Seq("source", "qp"))
      .crossJoin(broadcast(gc.agg(max("ng").as("ngv"))))
      .withColumn("pos", col("p") * (col("ngv") - 1))
    val lo = broadcast(gc.select(col("v").as("vlo"), col("cum"), col("c")))
    val hi = broadcast(gc.select(col("v").as("vhi"),
      col("cum").as("cum2"), col("c").as("c2")))
    x.join(lo, col("cum") - col("c") <= floor(col("pos")) &&
        floor(col("pos")) < col("cum"))
      .join(hi, col("cum2") - col("c2") <= ceil(col("pos")) &&
        ceil(col("pos")) < col("cum2"))
      .select(col("doc_id"), col("source"), col("qp").as("quality_ppm"),
        round(when(floor(col("pos")) === ceil(col("pos")) || col("vlo") === col("vhi"),
            col("vlo").cast("double"))
          .otherwise((ceil(col("pos")) - col("pos")) * col("vlo") +
            (col("pos") - floor(col("pos"))) * col("vhi")), 6).as("qnorm"))
      .orderBy("doc_id")
  }

  /** q219: quantile trend — exact p50/p90 of value per
    * (event_type, calendar day), the latency-SLO dashboard shape
    * (is the tail drifting day over day?). The q108 value-histogram
    * bracket interpolation with a day key added: per cell the
    * quantiles read off the (type, day, milli-value) histogram, so
    * a billion-event day never buffers in an aggregate — the same
    * OOM argument as q108, now per time bucket.
    */
  val q219QuantileTrend: QueryDef = QueryDef.sql(
    "q219_quantile_trend",
    s"""WITH qv AS (SELECT event_type,
       |    CAST(floor(t / 86400.0) AS BIGINT) AS day,
       |    CAST(round(value * 1000.0) AS BIGINT) AS v
       |  FROM (${graft.sources.Tables.seriesSql})),
       |c AS (SELECT event_type, day, count(*) AS n,
       |    quantile_cont(v, 0.5) AS p50m, quantile_cont(v, 0.9) AS p90m
       |  FROM qv GROUP BY event_type, day)
       |SELECT event_type, day, n,
       |  round(p50m / 1000.0, 6) AS p50, round(p90m / 1000.0, 6) AS p90
       |FROM c ORDER BY event_type, day""".stripMargin) { (spark, dir) =>
    val hist = graft.sources.Tables.series(spark, dir)
      .select(col("event_type"),
        expr("CAST(floor(t / 86400.0) AS BIGINT)").as("day"),
        expr("CAST(round(value * 1000.0) AS BIGINT)").as("v"))
      .groupBy("event_type", "day", "v").agg(count(lit(1)).as("cnt"))
    val cw = Window.partitionBy("event_type", "day")
    val cum = hist
      .withColumn("cum", sum("cnt").over(cw.orderBy("v")))
      .withColumn("n", sum("cnt").over(cw))
    def bracket(p: Double, tag: String): Seq[Column] = {
      val pos = (col("n") - 1).cast("double") * lit(p)
      val lo = floor(pos); val hi = ceil(pos)
      Seq(
        min(when(col("cum") - col("cnt") <= lo && lo < col("cum"), col("v"))).as(s"vlo_$tag"),
        min(when(col("cum") - col("cnt") <= hi && hi < col("cum"), col("v"))).as(s"vhi_$tag"))
    }
    val aggs = Seq(max("n").as("n")) ++ bracket(0.5, "50") ++ bracket(0.9, "90")
    val agged = cum.groupBy("event_type", "day").agg(aggs.head, aggs.tail: _*)
    def interp(p: Double, vlo: Column, vhi: Column): Column = {
      val pos = (col("n") - 1).cast("double") * lit(p)
      val lo = floor(pos); val hi = ceil(pos)
      when(lo === hi || vlo === vhi, vlo.cast("double"))
        .otherwise((hi.cast("double") - pos) * vlo.cast("double") +
          (pos - lo.cast("double")) * vhi.cast("double"))
    }
    agged.select(col("event_type"), col("day"), col("n"),
        round(interp(0.5, col("vlo_50"), col("vhi_50")) / 1e3, 6).as("p50"),
        round(interp(0.9, col("vlo_90"), col("vhi_90")) / 1e3, 6).as("p90"))
      .orderBy("event_type", "day")
  }

  /** Inter-arrival statistics per event type: milli-quantized gaps
    * between a user's consecutive same-type events, rolled up to
    * exact-integer mean and exact (interpolated) p50/p90 per type —
    * the cadence dashboard for event streams.
    *
    * Scale shape: the percentiles are EXACT but never buffer a
    * group's values. `event_type` has ~5 values, so a plain
    * `percentile(dtm, p)` would pour billions of longs into one
    * ObjectHashAggregate buffer per type at 100 TB. Instead the
    * milli-quantized gaps roll up to a VALUE HISTOGRAM —
    * `groupBy(event_type, dtm).count()` is a hash aggregate with
    * map-side combine whose size is bounded by the dtm domain
    * (distinct milli gaps ≲ time-range-in-ms), not the row count —
    * and the quantile is read off the prefix-summed histogram with
    * the same `position = p·(n−1)`, `(hi−pos)·v_lo + (pos−lo)·v_hi`
    * interpolation Spark's `Percentile` evaluates, so the output is
    * bit-identical to the buffered form (same trick as q86/q101).
    * The per-type prefix-sum window runs over the tiny histogram,
    * never the raw rows.
    */
  val q108Interarrival: QueryDef = QueryDef.sql(
    "q108_interarrival",
    s"""WITH s AS (SELECT user_id, event_id, event_type,
       |    t - min(t) OVER (PARTITION BY user_id) AS tn
       |  FROM (${graft.sources.Tables.seriesSql})),
       |d AS (SELECT event_type, CAST(round((tn - lag(tn) OVER (
       |    PARTITION BY user_id, event_type ORDER BY tn, event_id)) * 1000.0) AS BIGINT) AS dtm
       |  FROM s)
       |SELECT event_type, count(*) AS n_gaps,
       |  round(CAST(sum(dtm) AS DOUBLE) / count(*) / 1000.0, 6) AS mean_sec,
       |  round(quantile_cont(dtm, 0.5) / 1000.0, 6) AS p50_sec,
       |  round(quantile_cont(dtm, 0.9) / 1000.0, 6) AS p90_sec
       |FROM d WHERE dtm IS NOT NULL
       |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val byUserType = Window.partitionBy("user_id", "event_type").orderBy("tn", "event_id")
    val hist = graft.sources.Tables.seriesNorm(spark, dir)
      .withColumn("dtm",
        round((col("tn") - lag(col("tn"), 1).over(byUserType)) * 1e3).cast("long"))
      .filter(col("dtm").isNotNull)
      .groupBy("event_type", "dtm").agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum("cnt").over(Window.partitionBy("event_type").orderBy("dtm")))
      .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
    // the histogram rows covering the 0-based sort positions
    // floor(p·(n−1)) and ceil(p·(n−1)): row with cumulative range
    // [cum−cnt, cum) covers position i iff cum−cnt ≤ i < cum
    def bracket(p: Double, tag: String): Seq[Column] = {
      val pos = (col("n") - 1).cast("double") * lit(p)
      val lo = floor(pos); val hi = ceil(pos)
      Seq(
        min(when(col("cum") - col("cnt") <= lo && lo < col("cum"), col("dtm"))).as(s"vlo_$tag"),
        min(when(col("cum") - col("cnt") <= hi && hi < col("cum"), col("dtm"))).as(s"vhi_$tag"))
    }
    val aggs = Seq(max("n").as("n_gaps"), sum(col("dtm") * col("cnt")).as("dt_sum")) ++
      bracket(0.5, "50") ++ bracket(0.9, "90")
    val agged = cum.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    // Percentile.getPercentile's exact interpolation, replayed on the
    // bracketing values (no interpolation when pos is integral or the
    // two bracketing keys coincide)
    def interp(p: Double, vlo: Column, vhi: Column): Column = {
      val pos = (col("n_gaps") - 1).cast("double") * lit(p)
      val lo = floor(pos); val hi = ceil(pos)
      when(lo === hi || vlo === vhi, vlo.cast("double"))
        .otherwise((hi.cast("double") - pos) * vlo.cast("double") +
          (pos - lo.cast("double")) * vhi.cast("double"))
    }
    agged.select(col("event_type"), col("n_gaps"),
      round(col("dt_sum").cast("double") / col("n_gaps") / 1e3, 6).as("mean_sec"),
      round(interp(0.5, col("vlo_50"), col("vhi_50")) / 1e3, 6).as("p50_sec"),
      round(interp(0.9, col("vlo_90"), col("vhi_90")) / 1e3, 6).as("p90_sec"))
      .orderBy("event_type")
  }

  /** Document length histogram on log2 buckets (floor-log2 of the
    * word count as binary-string length — the same exact-integer
    * trick as q95): the corpus length profile every retention policy
    * is tuned against. Pure projection + one tiny hash aggregate.
    */
  val q109LengthHist: QueryDef = QueryDef.sql(
    "q109_length_hist",
    """WITH d AS (SELECT len(string_split(text, ' ')) AS nw FROM documents)
      |SELECT length(printf('%b', nw)) - 1 AS log2_bucket,
      |  count(*) AS n_docs, min(nw) AS min_words, max(nw) AS max_words,
      |  CAST(sum(nw) AS BIGINT) AS total_words
      |FROM d WHERE nw > 0
      |GROUP BY log2_bucket ORDER BY log2_bucket""".stripMargin) { (spark, dir) =>
    docs(spark, dir)
      .select(size(split(col("text"), " ")).cast("long").as("nw"))
      .filter(col("nw") > 0)
      .groupBy((length(bin(col("nw"))) - 1).cast("long").as("log2_bucket"))
      .agg(count(lit(1)).as("n_docs"), min("nw").as("min_words"),
        max("nw").as("max_words"), sum("nw").as("total_words"))
      .orderBy("log2_bucket")
  }

  /** Lagged CROSS-correlation between two event-rate series — does
    * click activity lead view activity (or vice versa), and at what
    * hourly offset? The q114 ACF machinery generalized to two
    * channels: both series are hourly event COUNTS on one shared
    * dense grid (integer counts, so the moments stay exact with no
    * quantization step and cannot overflow: count ≤ 1e9/bucket keeps
    * n·Σx² far under 2^63), lags 0..6 ride ONE window pass, `stack`
    * unpivots, one hash aggregate computes all seven lags' moments.
    *
    * Scale shape: the grid axis is time-span/hour — it grows with
    * calendar time, not data volume (a decade is 87k rows), so the
    * single-partition ordered window over the grid is a bounded
    * driver-free constant, while the heavy lifting (bucket counting)
    * is a map-side-combined aggregate over the full event stream.
    */
  val q131CrossCorr: QueryDef = {
    val maxLag = 6
    val lagSqls = (0 to maxLag).map(l =>
      s"SELECT $l AS lag, x, lag(y, $l) OVER (ORDER BY b) AS yl FROM gr")
    QueryDef.sql(
      "q131_cross_corr",
      s"""WITH e AS (SELECT epoch_us(ts) // 3600000000 AS b, event_type FROM events),
         |c AS (SELECT b,
         |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
         |    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS y
         |  FROM e GROUP BY b),
         |g AS (SELECT unnest(generate_series((SELECT min(b) FROM e), (SELECT max(b) FROM e))) AS b),
         |gr AS (SELECT g.b, coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
         |  FROM g LEFT JOIN c ON c.b = g.b),
         |p AS (${lagSqls.mkString("\nUNION ALL\n")}),
         |m AS (SELECT lag, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yl) AS BIGINT) AS sy,
         |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(yl AS HUGEINT) * yl) AS syy,
         |    sum(CAST(x AS HUGEINT) * yl) AS sxy
         |  FROM p WHERE yl IS NOT NULL GROUP BY lag)
         |, f AS (SELECT lag, n,
         |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS num,
         |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS dx,
         |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS dy
         |  FROM m)
         |SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
         |  CASE WHEN dx = 0 OR dy = 0 THEN NULL
         |       ELSE round(num / (sqrt(dx) * sqrt(dy)), 6) END AS r
         |FROM f ORDER BY lag""".stripMargin) { (spark, dir) =>
      val ev = graft.sources.Tables.events(spark, dir)
        .select(expr("(ts div 1000) div 3600000000").as("b"), col("event_type"))
      val counts = ev.groupBy("b").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("y"))
      val grid = ev.agg(min("b").as("lo"), max("b").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("b"))
      var gr = grid.join(counts, Seq("b"), "left")
        .na.fill(0L, Seq("x", "y"))
      val ordered = Window.orderBy("b")
      (0 to maxLag).foreach(l => gr = gr.withColumn(s"y$l", lag("y", l).over(ordered)))
      val stackExpr = (0 to maxLag).map(l => s"${l}L, y$l").mkString(", ")
      val stacked = gr.selectExpr("x", s"stack(${maxLag + 1}, $stackExpr) AS (lag, yl)")
        .filter(col("yl").isNotNull)
      val m = stacked.groupBy("lag").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("yl").as("sy"),
        sum(expr("CAST(x AS DECIMAL(20,0)) * x")).as("sxx"),
        sum(expr("CAST(yl AS DECIMAL(20,0)) * yl")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(20,0)) * yl")).as("sxy"))
      // cast-before-product: hourly counts square to ~10¹⁸ at large
      // volumes, so the int64 n·Σx² form has no headroom at all
      val dx = expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)")
      val dy = expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)")
      val num = expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)")
      m.select(col("lag"), col("n").as("n_pairs"),
          when(dx === 0 || dy === 0, lit(null))
            .otherwise(round(num / (sqrt(dx) * sqrt(dy)), 6)).as("r"))
        .orderBy("lag")
    }
  }

  /** Feature hashing (the "hashing trick"): every document becomes a
    * fixed 16-dimension signed bag-of-words vector with NO vocabulary
    * pass — dim = hash % 16, sign from an independent hash bit, value
    * = signed token count. This is the unsupervised featurizer for
    * cheap classifiers/cluster probes over an unbounded vocabulary:
    * one tokenize + one integer hash aggregate, zero joins, zero
    * global state — the embarrassingly-parallel shape. Integer sums
    * ⇒ bit-deterministic.
    */
  val q141FeatureHash: QueryDef = {
    val dims = 16
    QueryDef.sql(
      "q141_feature_hash",
      s"""WITH t AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents))
         |SELECT doc_id, h % $dims AS dim,
         |  CAST(sum(CASE WHEN (h >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
         |FROM t GROUP BY doc_id, dim
         |ORDER BY doc_id, dim""".stripMargin) { (spark, dir) =>
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .select(col("doc_id"), TextHash.base32(col("token")).as("h"))
        .groupBy(col("doc_id"), (col("h") % dims).as("dim"))
        .agg(sum(when(shiftright(col("h"), 4).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as("v"))
        .orderBy("doc_id", "dim")
    }
  }

  /** One-pass DATA PROFILER over the numeric event columns — the
    * ingestion-health report every pipeline runs before training
    * (null fractions, cardinalities, ranges). `stack` unpivots the
    * columns so ONE hash aggregate profiles them all; counts and
    * distincts are integers, min/max pass through un-arithmeticked —
    * fully deterministic with no quantization step.
    */
  val q144Profile: QueryDef = QueryDef.sql(
    "q144_profile",
    """WITH u AS (
      |  SELECT 'event_id' AS column_name, CAST(event_id AS DOUBLE) AS v FROM events
      |  UNION ALL SELECT 'user_id', CAST(user_id AS DOUBLE) FROM events
      |  UNION ALL SELECT 'value', value FROM events)
      |SELECT column_name, count(*) AS n_rows, count(v) AS n_present,
      |  count(DISTINCT v) AS n_distinct, min(v) AS v_min, max(v) AS v_max
      |FROM u GROUP BY column_name ORDER BY column_name""".stripMargin) { (spark, dir) =>
    graft.sources.Tables.events(spark, dir)
      .selectExpr("""stack(3,
        'event_id', CAST(event_id AS DOUBLE),
        'user_id', CAST(user_id AS DOUBLE),
        'value', value) AS (column_name, v)""")
      .groupBy("column_name")
      .agg(count(lit(1)).as("n_rows"), count("v").as("n_present"),
        countDistinct("v").as("n_distinct"),
        min("v").as("v_min"), max("v").as("v_max"))
      .orderBy("column_name")
  }

  /** TRAIN→TEST span leakage audit — q77/q94 aim at external
    * benchmarks; this one audits the corpus against ITSELF: which
    * held-out (test-split) documents contain 8-word spans that also
    * occur in the train split. Per test doc: span count, leaked-span
    * count, and the exact-integer ppm leak fraction — the metric that
    * decides whether a held-out eval is actually held out.
    *
    * Scale shape: one span explode over the corpus, the train span
    * set stays DISTRIBUTED (distinct on the 32-char digest, shuffle
    * left-join on that key — corpus-sized, never broadcast), one
    * per-doc re-aggregate.
    */
  val q145SplitLeakage: QueryDef = QueryDef.sql(
    "q145_split_leakage",
    s"""WITH w AS (SELECT doc_id,
       |    ${TextHash.duckMd5Bucket("doc_id", 100L)} AS bucket,
       |    string_split(text, ' ') AS ws FROM documents),
       |sp AS (SELECT doc_id, bucket,
       |    md5(array_to_string(ws[i:i+${SpanWords - 1}], ' ')) AS h
       |  FROM w, unnest(generate_series(1, len(ws) - ${SpanWords - 1})) AS t(i)),
       |tr AS (SELECT DISTINCT h FROM sp WHERE bucket < 80),
       |te AS (SELECT doc_id, h FROM sp WHERE bucket >= 90)
       |SELECT te.doc_id, count(*) AS n_spans, count(tr.h) AS n_leaked,
       |  CAST((count(tr.h) * 1000000) // count(*) AS BIGINT) AS leak_ppm
       |FROM te LEFT JOIN tr ON tr.h = te.h
       |GROUP BY te.doc_id ORDER BY te.doc_id""".stripMargin) { (spark, dir) =>
    val spans = docs(spark, dir)
      .withColumn("bucket", TextHash.md5Bucket(col("doc_id"), 100L))
      .withColumn("__ws", split(col("text"), " "))
      .select(col("doc_id"), col("bucket"),
        explode(TextHash.shinglesFromWords(col("__ws"), SpanWords)).as("span"))
      .withColumn("h", md5(col("span")))
    val train = spans.filter(col("bucket") < 80)
      .select("h").distinct().withColumn("leak", lit(1))
    spans.filter(col("bucket") >= 90)
      .join(train, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), count("leak").as("n_leaked"))
      .selectExpr("doc_id", "n_spans", "n_leaked",
        "CAST((n_leaked * 1000000) div n_spans AS BIGINT) AS leak_ppm")
      .orderBy("doc_id")
  }

  /** FIT-ON-TRAIN / APPLY-ON-HOLDOUT standardization — the core ML
    * discipline the plain q13 z-score doesn't model: per-source
    * quality moments are fitted on the TRAIN split only, then applied
    * to the VAL split (fitting on the data you score is leakage).
    * Quality quantizes to milli-units (q ≤ 1000 ⇒ n·Σq² < 2^63 up to
    * ~9e12 docs/source) so the moments are exact integers;
    * z = (n·q − Σq) / √(n·Σq² − (Σq)²) is one sqrt + one division
    * over those exact inputs — the shared IEEE shape of q98/q114.
    *
    * Scale shape: one train aggregate (one tiny row per source)
    * broadcast-joined to the val docs; zero extra shuffles beyond the
    * source rollup.
    */
  val q146FitApply: QueryDef = QueryDef.sql(
    "q146_fit_apply",
    s"""WITH ${graft.operators.TextOps.duckQualityCtes},
       |d AS (SELECT q.doc_id, dd.source, q.quality_ppm // 1000 AS qm,
       |    ${TextHash.duckMd5Bucket("q.doc_id", 100L)} AS bucket
       |  FROM qq q JOIN documents dd ON dd.doc_id = q.doc_id),
       |f AS (SELECT source, count(*) AS n,
       |    CAST(sum(qm) AS BIGINT) AS sq, CAST(sum(qm * qm) AS BIGINT) AS sqq
       |  FROM d WHERE bucket < 80 GROUP BY source),
       |v AS (SELECT d.doc_id, d.source, d.qm, f.n, f.sq, f.sqq
       |  FROM d JOIN f ON f.source = d.source
       |  WHERE d.bucket >= 80 AND d.bucket < 90)
       |SELECT doc_id, source, CAST(qm AS BIGINT) AS q_milli,
       |  CASE WHEN n * sqq - sq * sq = 0 THEN NULL
       |       ELSE round(CAST(n * qm - sq AS DOUBLE)
       |         / sqrt(CAST(n * sqq - sq * sq AS DOUBLE)), 6) END AS z
       |FROM v ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val d = graft.operators.TextOps.withQuality(docs(spark, dir))
      .withColumn("qm", expr("quality_ppm div 1000"))
      .withColumn("bucket", TextHash.md5Bucket(col("doc_id"), 100L))
      .select("doc_id", "source", "qm", "bucket")
    val fit = d.filter(col("bucket") < 80)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("qm").as("sq"),
        sum(col("qm") * col("qm")).as("sqq"))
    val denom = col("n") * col("sqq") - col("sq") * col("sq")
    d.filter(col("bucket") >= 80 && col("bucket") < 90)
      .join(broadcast(fit), "source")
      .select(col("doc_id"), col("source"), col("qm").as("q_milli"),
        when(denom === 0, lit(null))
          .otherwise(round((col("n") * col("qm") - col("sq")).cast("double") /
            sqrt(denom.cast("double")), 6)).as("z"))
      .orderBy("doc_id")
  }

  /** Per-document boilerplate fraction — what share of a document's
    * 8-word spans also appear in at least one OTHER document (the
    * q100 census turned into a per-doc quality signal: the CCNet-
    * style "how much of this page is template/quote" score that
    * training pipelines filter on). `boilerplate_ppm` is one integer
    * division of two exact counts.
    *
    * Scale shape: spans key by their fixed-width md5 digest (never
    * shuffling the span strings — q100's measured lesson), one hash
    * aggregate builds the duplicated-digest set, and the flag comes
    * back via a shuffle join on the digest — no self-join, no pair
    * explosion, every stage combinable map-side.
    */
  val q184BoilerplatePpm: QueryDef = QueryDef.sql(
    "q184_boilerplate_ppm",
    s"""WITH sp AS (SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(ws) - ${SpanWords - 1}),
       |    i -> array_to_string(ws[i:i+${SpanWords - 1}], ' '))) AS span
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |h AS (SELECT doc_id, md5(span) AS h FROM sp),
       |g AS (SELECT h, count(DISTINCT doc_id) AS nd FROM h GROUP BY h),
       |j AS (SELECT h.doc_id, CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END AS dup
       |  FROM h JOIN g USING (h))
       |SELECT doc_id, count(*) AS n_spans, CAST(sum(dup) AS BIGINT) AS n_dup,
       |  1000000 * CAST(sum(dup) AS BIGINT) // count(*) AS boilerplate_ppm
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    boilerplateDf(docs(spark, dir)).orderBy("doc_id")
  }

  /** The q184 score as a reusable corpus stage (feeds the same
    * filter/mixture stages as the quality score).
    */
  def boilerplateDf(corpus: DataFrame, spanWords: Int = SpanWords): DataFrame = {
    // consumed twice (duplicated-span census + the join back) — pinned
    // so the tokenize/shingle/md5 pass runs once per query
    val sp = corpus
      .withColumn("__ws", split(col("text"), " "))
      .select(col("doc_id"),
        explode(TextHash.shinglesFromWords(col("__ws"), spanWords)).as("span"))
      .select(col("doc_id"), md5(col("span")).as("h"))
      .scopedPersistEager()
    val dup = sp.groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("h")
    sp.join(dup.withColumn("dup", lit(1L)), Seq("h"), "left")
      .withColumn("dup", coalesce(col("dup"), lit(0L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("dup").as("n_dup"))
      .select(col("doc_id"), col("n_spans"), col("n_dup"),
        expr("1000000L * n_dup div n_spans").as("boilerplate_ppm"))
  }

  val all: Seq[QueryDef] = Seq(q92PropsExtract, q93ChunkDedup,
    q94BloomContamination, q95SurprisalBits, q96MixtureSample, q232DsirWeights,
    q97LabelCentroids, q98Autocorr, q99Funnel, q100RepeatedSpans,
    q107QualityRank, q108Interarrival, q109LengthHist,
    q114Acf, q115BigramSurprisal, q131CrossCorr, q133ChunkScrub,
    q141FeatureHash, q144Profile, q145SplitLeakage, q146FitApply,
    q184BoilerplatePpm, q188RrfFusion, q203QuantileNormalize, q219QuantileTrend)
}
