package graft.operators

import graft.QueryDef
import graft.functions.TextHash
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedDataset

/** Text analysis for training-data pipelines over `documents`:
  * language ID (word-n-gram marker voting), quality scoring, token
  * counting, and winnowing document fingerprints.
  *
  * Every operator here is a per-row projection over the corpus — no
  * shuffle at all (the plan is scan → project → sort-for-output), so
  * at 100 TB these run at full scan throughput with column pruning
  * down to (doc_id, text).
  */
object TextOps {

  /** Marker vocabulary per language — the word-level stand-in for a
    * character-n-gram language profile (a real profile is the same
    * shape: a small broadcast dictionary scored per document). Scored
    * in a fixed priority order so argmax ties are deterministic.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "fr" -> Seq("le", "les", "et", "est", "dans"),
    "zh" -> Seq("de", "shi", "he", "zai", "le"))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  private[operators] def sqlList(ws: Seq[String], l: String, r: String): String =
    ws.map(w => s"'$w'").mkString(l, ", ", r)

  /** DuckDB CASE expression over a word-list column `ws` implementing
    * the marker-voting language prediction (first language in fixed
    * order achieving the max marker count; all zero → 'und').
    */
  def duckLangCase: String = {
    val scores = langMarkers.map { case (l, ms) =>
      l -> s"len(list_filter(ws, w -> list_contains(${sqlList(ms, "[", "]")}, w)))"
    }
    val m = scores.map(_._2).mkString("greatest(", ", ", ")")
    val whens = scores.map { case (l, s) => s"WHEN $s = $m THEN '$l'" }.mkString("\n  ")
    s"CASE WHEN $m = 0 THEN 'und'\n  $whens END"
  }

  /** Native marker-voting prediction over a word-array column
    * (graft.functions.LangIdExpr): one hash probe per word instead of
    * 5 interpreted per-word filter passes; identical argmax/tie
    * semantics to [[duckLangCase]].
    */
  def langPred(ws: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.LangIdExpr(
        org.apache.spark.sql.GraftExpressionBridge.expression(ws), langMarkers))

  /** Language ID: count marker hits per language over the word list,
    * predict the first language (fixed order) achieving the max; all
    * zero → 'und'.
    */
  val q50LangId: QueryDef = QueryDef.sql(
    "q50_lang_id",
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
       |SELECT doc_id, $duckLangCase AS lang_pred
       |FROM w ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    graft.sources.Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), langPred(col("ws")).as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Add the quality columns (`ws`, `n_words`, `mean_wlen`,
    * `stop_ratio`, `quality_ppm`, `quality`) to any relation with a
    * `text` column — the per-row metric stack shared by q51/q76/q78
    * and the public [[graft.api.Corpus]] facade. Pure projections:
    * zero shuffle.
    *
    * The composite score is EXACT INTEGER parts-per-million:
    * `ppm = (320e6·stops + 30e6·min(chars, 8n)) div 800n
    *        + min(3000n, 300000)`
    * — algebraically `0.4·stop_ratio + 0.3·min(mean_wlen/8, 1) +
    * 0.3·min(n/100, 1)` scaled to 1e6 with ONE integer floor. A float
    * composite rounded at 6 dp is bit-identical across engines right
    * up until a value lands within an ulp of a rounding boundary —
    * observed at sf0.1 (0.2878125), where Spark's BigDecimal half-up
    * and DuckDB's float-multiply rounding split, flipping q51 AND
    * every downstream consumer (q76/q78/q80/q107). Integer ppm has no
    * boundary to sit on; `quality = ppm / 1e6` is one IEEE division,
    * identical everywhere.
    */
  def withQuality(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")))
      .withColumn("__chars", expr("aggregate(ws, 0, (s, x) -> s + length(x))"))
      .withColumn("__stops",
        expr(s"size(filter(ws, x -> array_contains(${sqlList(stopwords, "array(", ")")}, x)))"))
      .withColumn("mean_wlen", col("__chars") / col("n_words"))
      .withColumn("stop_ratio", col("__stops") / col("n_words"))
      .withColumn("quality_ppm", expr(
        """(320000000L * __stops + 30000000L * least(cast(__chars as bigint), 8L * n_words))
          |  div (800L * n_words) + least(3000L * n_words, 300000L)""".stripMargin))
      .withColumn("quality", col("quality_ppm") / lit(1e6))
      .drop("__chars", "__stops")

  /** DuckDB CTE chain `qw, qm, qq` ending in
    * `qq(doc_id, quality_ppm, quality)` — the oracle twin of
    * [[withQuality]]: identical integer arithmetic, one shared IEEE
    * division for the double view.
    */
  def duckQualityCtes: String =
    s"""qw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |qm AS (SELECT doc_id, len(ws) AS n_words,
       |    list_reduce(list_transform(ws, x -> len(x)), (s, x) -> s + x) AS chars,
       |    len(list_filter(ws, x -> list_contains(${sqlList(stopwords, "[", "]")}, x))) AS stops
       |  FROM qw),
       |qq AS (SELECT doc_id,
       |    (320000000 * stops + 30000000 * least(chars, 8 * n_words))
       |      // (800 * n_words) + least(3000 * n_words, 300000) AS quality_ppm,
       |    ((320000000 * stops + 30000000 * least(chars, 8 * n_words))
       |      // (800 * n_words) + least(3000 * n_words, 300000)) / 1e6 AS quality
       |  FROM qm)""".stripMargin

  /** Quality score: word count, mean word length, stopword ratio →
    * bounded ppm composite in [0, 1e6]. All outputs are either exact
    * integers or single bit-identical IEEE divisions — NOTHING is
    * rounded (see [[withQuality]] for why rounding is the hazard).
    */
  val q51QualityScore: QueryDef = QueryDef.sql(
    "q51_quality_score",
    s"""WITH $duckQualityCtes,
       |j AS (SELECT m.doc_id, m.n_words, m.chars, m.stops,
       |    q.quality_ppm, q.quality
       |  FROM qm m JOIN qq q ON q.doc_id = m.doc_id)
       |SELECT doc_id, n_words, chars / n_words AS mean_wlen,
       |  stops / n_words AS stop_ratio, CAST(quality_ppm AS BIGINT) AS quality_ppm,
       |  quality
       |FROM j ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    withQuality(graft.sources.Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_words"), col("mean_wlen"),
        col("stop_ratio"), col("quality_ppm"), col("quality"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens, regex word/punct tokens, and
    * the chars/4 BPE-size estimate.
    */
  val q52TokenCount: QueryDef = QueryDef.sql(
    "q52_token_count",
    raw"""SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
         |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS re_tokens,
         |  CAST(ceil(len(text) / 4.0) AS BIGINT) AS bpe_est
         |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(raw"\w+|[^\w\s]"), lit(0)))
          .cast("long").as("re_tokens"),
        ceil(length(col("text")) / 4.0).cast("long").as("bpe_est"))
      .orderBy("doc_id")
  }

  /** Winnowing fingerprint: min shingle-hash per 4-window over the
    * shingle-hash sequence, deduplicated — summarized as count, min,
    * max, xor (order-insensitive, so Spark/DuckDB list-op ordering
    * differences can't flip the hash).
    */
  val q53Fingerprint: QueryDef = QueryDef.sql(
    "q53_fingerprint",
    s"""WITH shl AS (SELECT doc_id, list_transform(
       |    generate_series(1, len(ws) - 2),
       |    i -> ${TextHash.duckBase32("array_to_string(ws[i:i+2], ' ')")}) AS hl
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |fp AS (SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(hl) - 3),
       |    i -> list_aggregate(hl[i:i+3], 'min'))) AS fps
       |  FROM shl)
       |SELECT doc_id, len(fps) AS n_fp,
       |  list_aggregate(fps, 'min') AS fp_min,
       |  list_aggregate(fps, 'max') AS fp_max,
       |  CASE WHEN len(fps) = 0 THEN 0
       |       ELSE list_reduce(list_prepend(0::BIGINT, fps), (s, x) -> xor(s, x)) END AS fp_xor
       |FROM fp ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    // native windowed-min + distinct summary (WinnowFingerprint):
    // one primitive loop instead of a lambda frame per window
    val fp = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.WinnowFingerprint(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("hs")), 4))
    graft.sources.Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("hs", TextHash.shingleHashesFromWords(col("ws")))
      .withColumn("fp", fp)
      .select(col("doc_id"),
        col("fp.n_fp").as("n_fp"),
        col("fp.fp_min").as("fp_min"),
        col("fp.fp_max").as("fp_max"),
        col("fp.fp_xor").as("fp_xor"))
      .orderBy("doc_id")
  }

  /** Character-level Rabin–Karp rolling-hash fingerprint: the 5-gram
    * polynomial hash at every character position (base 257 mod
    * 1,000,003 — small enough that 5 terms stay exact in both
    * engines), summarized as min / max / distinct count. The per-row
    * expression is the unrolled 5-term window sum, so the "rolling"
    * scan is a projection, not a sequential kernel.
    */
  val q59RollingHashFp: QueryDef = {
    val (b, m, k) = (257L, 1000003L, 5)
    val duckTerm = (0 until k).map(j =>
      s"ord(substr(text, i + $j, 1)) * ${Seq.fill(j)(b).product.max(1L)}").mkString(" + ")
    QueryDef.sql(
      "q59_rolling_hash_fp",
      s"""WITH h AS (SELECT doc_id, list_transform(
         |    generate_series(1, len(text) - ${k - 1}),
         |    i -> ($duckTerm) % $m) AS hs
         |  FROM documents WHERE len(text) >= $k)
         |SELECT doc_id, list_aggregate(hs, 'min') AS fp_min,
         |  list_aggregate(hs, 'max') AS fp_max,
         |  len(list_distinct(hs)) AS n_distinct
         |FROM h ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      // native whole-scan (RollingHashSummary): one codepoint pass
      // per doc; exact-integer hash identical to the oracle's
      // unrolled 5-term polynomial
      val fp = org.apache.spark.sql.GraftExpressionBridge.column(
        graft.functions.RollingHashSummary(
          org.apache.spark.sql.GraftExpressionBridge.expression(col("text")), b, m, k))
      graft.sources.Tables.documents(spark, dir)
        .filter(length(col("text")) >= k)
        .withColumn("fp", fp)
        .select(col("doc_id"),
          col("fp.fp_min").as("fp_min"),
          col("fp.fp_max").as("fp_max"),
          col("fp.n_distinct").as("n_distinct"))
        .orderBy("doc_id")
    }
  }

  /** TF-IDF top-5 terms per document, in fixed-point arithmetic:
    * `idf_scaled = (N · 10^3) div df` and `score = tf · idf_scaled`
    * stay integers end-to-end, so the ranking is bit-identical on any
    * partitioning and in DuckDB. (A log-idf would hinge on `ln`,
    * which libm and the JVM round differently by ulps — exactly the
    * cross-engine flakiness the float policy forbids; the rational
    * weight preserves the rarity ORDER, which is all a top-k needs.)
    *
    * Overflow bound: milli-scaled idf keeps the worst score
    * `tf_max · N · 10^3` under 2^63 for N up to ~10^11 docs with
    * tf up to ~10^4 — past 100 TB. (A 10^6 scale wraps three orders
    * of magnitude sooner, inside the advertised range.)
    *
    * Scale shape: tf is one (doc, token) hash aggregate with map-side
    * combine; df reuses the persisted tf relation (one narrow scan);
    * the idf join is token-keyed (vocabulary-sized, Zipf-truncated by
    * the join itself — no row blow-up); the per-doc top-5 compiles to
    * WindowGroupLimit, pruning to 5 rows per doc map-side before the
    * rank exchange.
    */
  val q89TfidfTopk: QueryDef = QueryDef.sql(
    "q89_tfidf_topk",
    """WITH tf AS (SELECT doc_id, token, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY doc_id, token),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(*) AS n_total FROM documents),
      |sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
      |    tf.tf * ((n.n_total * 1000) // df.df) AS score
      |  FROM tf JOIN df USING (token) CROSS JOIN n),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, token) AS rnk FROM sc)
      |SELECT doc_id, rnk, token, tf, df, score
      |FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docsDf = graft.sources.Tables.documents(spark, dir)
    val tf = docsDf
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .scopedPersist()
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docsDf.agg(count(lit(1)).as("n_total"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    // tf stays persisted until the harness's per-query clearCache()
    // (Verify/Bench both scope caches that way).
    tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("score", col("tf") * expr("(n_total * 1000) div df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("doc_id", "rnk", "token", "tf", "df", "score")
      .orderBy("doc_id", "rnk")
  }

  /** Content-aware document similarity through the inverted index:
    * sparse idf-weighted cosine over DISCRIMINATIVE terms (document
    * frequency in [2, 30]) — the retrieval-style near-dup signal that
    * catches paraphrased reuse which exact/shingle dedup misses, at
    * inverted-index cost instead of all-pairs.
    *
    * Weights are q89's fixed-point integer idf (`(N·1000) div df`,
    * binary tf), so dots and norms are EXACT integer sums; the cosine
    * is two IEEE sqrts and one division over those exact integers,
    * rounded identically on both engines. Integer headroom: terms
    * stay inside int64 while `Σ w² < 2^63` — ~10^3 discriminative
    * terms/doc at N ≤ 5×10^7 docs; past that, rescale the idf
    * fixed-point (or DECIMAL(38)).
    *
    * Scale shape: the pair relation is keyed on the term, and the
    * df ≤ 30 cap bounds every posting list — join fan-out per term is
    * ≤ 30², never corpus-shaped (the standard "drop stop-words from
    * the index" bound). Top-50 is TakeOrderedAndProject.
    */
  val q169TfidfDocsim: QueryDef = QueryDef.sql(
    "q169_tfidf_docsim",
    """WITH tf AS (SELECT DISTINCT doc_id, token
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(*) AS n_total FROM documents),
      |p AS (SELECT tf.doc_id, tf.token, (n.n_total * 1000) // df.df AS w
      |  FROM tf JOIN df USING (token) CROSS JOIN n
      |  WHERE df.df BETWEEN 2 AND 30),
      |nm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS norm2 FROM p GROUP BY doc_id),
      |d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(sum(a.w * b.w) AS BIGINT) AS dot, count(*) AS n_shared
      |  FROM p a JOIN p b ON a.token = b.token AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc_a, doc_b, dot, n_shared,
      |  round(dot / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) AS sim
      |FROM d JOIN nm na ON doc_a = na.doc_id JOIN nm nb ON doc_b = nb.doc_id
      |ORDER BY sim DESC, doc_a, doc_b LIMIT 50""".stripMargin) { (spark, dir) =>
    val docsDf = graft.sources.Tables.documents(spark, dir)
    val tf = docsDf
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 30))
    val n = docsDf.agg(count(lit(1)).as("n_total"))
    val p = tf.join(df, Seq("token")).crossJoin(broadcast(n))
      .select(col("token"), col("doc_id"), expr("(n_total * 1000) div df").as("w"))
      .scopedPersist()
    val nm = p.groupBy("doc_id").agg(sum(expr("w * w")).as("norm2"))
    val pairs = p.select(col("token"), col("doc_id").as("doc_a"), col("w").as("wa"))
      .join(p.select(col("token"), col("doc_id").as("doc_b"), col("w").as("wb")),
        Seq("token"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(expr("wa * wb")).as("dot"), count(lit(1)).as("n_shared"))
    pairs
      .join(nm.select(col("doc_id").as("doc_a"), col("norm2").as("na")), Seq("doc_a"))
      .join(nm.select(col("doc_id").as("doc_b"), col("norm2").as("nb")), Seq("doc_b"))
      .withColumn("sim", round(col("dot") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6))
      .select("doc_a", "doc_b", "dot", "n_shared", "sim")
      .orderBy(col("sim").desc, col("doc_a"), col("doc_b"))
      .limit(50)
  }

  /** Gopher-style rule filter report (Rae et al. 2021, §A1.1.2, the
    * canonical pretraining quality rule set): per-rule pass counts
    * and the overall keep rate under
    *   R1 50 ≤ words ≤ 100 000,
    *   R2 3 ≤ mean word length ≤ 10,
    *   R3 ≥ 70% of words contain an alphabetic character,
    *   R4 ≥ 2 stopword hits.
    * All rules are integer comparisons (mean word length via
    * `3·n ≤ chars ≤ 10·n`, ratios via cross-multiplication) — no
    * float thresholds anywhere. One projection + one 1-row rollup.
    */
  val q178GopherRules: QueryDef = QueryDef.sql(
    "q178_gopher_rules",
    s"""WITH m AS (SELECT len(ws) AS nw,
       |    list_reduce(list_transform(ws, x -> len(x)), (s, x) -> s + x) AS chars,
       |    len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_w,
       |    len(list_filter(ws, x -> list_contains(${sqlList(stopwords, "[", "]")}, x))) AS stops
       |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)),
       |r AS (SELECT (nw BETWEEN 50 AND 100000) AS r1,
       |    (3 * nw <= chars AND chars <= 10 * nw) AS r2,
       |    (10 * alpha_w >= 7 * nw) AS r3, (stops >= 2) AS r4 FROM m)
       |SELECT count(*) AS n_docs,
       |  CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS r1_pass,
       |  CAST(sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS r2_pass,
       |  CAST(sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) AS r3_pass,
       |  CAST(sum(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT) AS r4_pass,
       |  CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS keep_n,
       |  CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS keep_ppm
       |FROM r""".stripMargin) { (spark, dir) =>
    val m = graft.sources.Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("ws"))
      .select(size(col("ws")).as("nw"),
        expr("aggregate(ws, 0, (s, x) -> s + length(x))").as("chars"),
        expr("size(filter(ws, x -> x rlike '[A-Za-z]'))").as("alpha_w"),
        expr(s"size(filter(ws, x -> array_contains(${sqlList(stopwords, "array(", ")")}, x)))")
          .as("stops"))
    m.select(col("nw").between(50, 100000).as("r1"),
        (lit(3) * col("nw") <= col("chars") && col("chars") <= lit(10) * col("nw")).as("r2"),
        (lit(10) * col("alpha_w") >= lit(7) * col("nw")).as("r3"),
        (col("stops") >= 2).as("r4"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("r1"), 1L).otherwise(0L)).as("r1_pass"),
        sum(when(col("r2"), 1L).otherwise(0L)).as("r2_pass"),
        sum(when(col("r3"), 1L).otherwise(0L)).as("r3_pass"),
        sum(when(col("r4"), 1L).otherwise(0L)).as("r4_pass"),
        sum(when(col("r1") && col("r2") && col("r3") && col("r4"), 1L)
          .otherwise(0L)).as("keep_n"))
      .withColumn("keep_ppm", expr("keep_n * 1000000L div n_docs"))
  }

  /** Language-ID confusion matrix: the q50 marker-voting classifier
    * evaluated against the corpus's labeled `lang` column — cell
    * counts plus per-cell recall ppm against the true-label row
    * total. The standard classifier-evaluation artifact, and the
    * audit that says whether the cheap n-gram ID is good enough to
    * gate a mixture (its diagonal) or where it bleeds (off-diagonal
    * cells).
    *
    * Scale shape: one projection + one (lang, lang_pred) hash
    * aggregate; row totals ride back on a broadcast of the
    * |langs|-row diagonal relation.
    */
  val q179LangConfusion: QueryDef = QueryDef.sql(
    "q179_lang_confusion",
    s"""WITH w AS (SELECT lang, string_split(text, ' ') AS ws FROM documents),
       |p AS (SELECT lang, $duckLangCase AS lang_pred FROM w),
       |m AS (SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY lang, lang_pred),
       |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS lang_n FROM m GROUP BY lang)
       |SELECT m.lang, m.lang_pred, m.n, t.lang_n,
       |  CAST(m.n * 1000000 // t.lang_n AS BIGINT) AS cell_ppm
       |FROM m JOIN t ON m.lang = t.lang
       |ORDER BY m.lang, m.lang_pred""".stripMargin) { (spark, dir) =>
    val p = graft.sources.Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .select(col("lang"), langPred(col("ws")).as("lang_pred"))
    val m = p.groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val t = m.groupBy("lang").agg(sum("n").as("lang_n"))
    m.join(broadcast(t), Seq("lang"))
      .withColumn("cell_ppm", expr("n * 1000000L div lang_n"))
      .select("lang", "lang_pred", "n", "lang_n", "cell_ppm")
      .orderBy("lang", "lang_pred")
  }

  /** Positional-inverted-index PHRASE search — the retrieval
    * primitive of a corpus pipeline (find every document containing
    * an exact multi-word phrase, with match counts). The index is the
    * relation `(token, doc_id, pos)`; a phrase query is an equi join
    * of the phrase terms' posting rows on `(doc_id, pos + offset)` —
    * adjacency becomes a join key, never a scan over text.
    *
    * Scale shape: at corpus scale the postings relation is
    * materialized once, bucketed/partitioned BY TOKEN, so a phrase
    * query reads only its terms' buckets (two partition-pruned scans
    * here), and the positional join is an equi hash join keyed on
    * (doc_id, pos) — selective terms keep both sides small, stopword
    * terms are exactly what the q93/q116 df-threshold machinery
    * prunes from the index. Integer positions ⇒ deterministic.
    */
  val q138PhraseSearch: QueryDef = {
    val (t1, t2) = ("table", "hash")
    QueryDef.sql(
      "q138_phrase_search",
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |p AS (SELECT doc_id, i - 1 AS pos, ws[i] AS tok
         |  FROM w, unnest(generate_series(1, len(ws))) AS t(i)),
         |a AS (SELECT doc_id, pos FROM p WHERE tok = '$t1'),
         |b AS (SELECT doc_id, pos FROM p WHERE tok = '$t2')
         |SELECT a.doc_id, count(*) AS n_matches,
         |  CAST(min(a.pos) AS BIGINT) AS first_pos
         |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin) { (spark, dir) =>
      val postings = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val pa = postings.filter(col("tok") === t1)
        .select(col("doc_id"), col("pos"))
      val pb = postings.filter(col("tok") === t2)
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      pa.join(pb, Seq("doc_id", "pos"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_matches"),
          min("pos").cast("long").as("first_pos"))
        .orderBy("doc_id")
    }
  }

  /** q201: Simpson diversity (repeat-probability) of each source's
    * token distribution — `D = Σ c·(c−1) / (n·(n−1))`, the
    * probability two tokens drawn without replacement coincide.
    * Low D = diverse vocabulary, high D = repetitive source — the
    * concentration complement of q192's entropy (and exactly
    * computable where entropy needs logs). Both moment sums are
    * exact int64; D is one fixed-order double division, rounded
    * once. Inverse Simpson (effective vocabulary size) rides along.
    *
    * Scale shape: one (source, token) hash aggregate with map-side
    * combine, one per-source rollup — the q84 shape.
    */
  val q201SimpsonDiversity: QueryDef = QueryDef.sql(
    "q201_simpson_diversity",
    """WITH c AS (SELECT source, w, count(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY source, w),
      |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(c * (c - 1)) AS BIGINT) AS rep, count(*) AS n_vocab
      |  FROM c GROUP BY source)
      |SELECT source, n AS n_tokens, CAST(n_vocab AS BIGINT) AS n_vocab,
      |  round(CAST(rep AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 6) AS simpson,
      |  round((CAST(n AS DOUBLE) * (n - 1)) / rep, 6) AS inv_simpson
      |FROM t WHERE n >= 2 AND rep > 0 ORDER BY source""".stripMargin) { (spark, dir) =>
    graft.sources.Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n"), sum(expr("c * (c - 1)")).as("rep"),
        count(lit(1)).as("n_vocab"))
      .filter(col("n") >= 2 && col("rep") > 0)
      .select(col("source"), col("n").as("n_tokens"), col("n_vocab"),
        round(expr("CAST(rep AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))"), 6).as("simpson"),
        round(expr("(CAST(n AS DOUBLE) * (n - 1)) / rep"), 6).as("inv_simpson"))
      .orderBy("source")
  }

  /** q210: Zipf rank-frequency fit — is the vocabulary's rank-
    * frequency curve the power law a natural corpus shows (slope
    * ≈ −1 on log-log), or the flat profile of templated/synthetic
    * text? Both axes are integer floor-log2 (bit-length — the q163
    * trick, no libm), the rank is 1 + words-with-strictly-greater
    * count read off the bounded COUNT histogram (q107 — no global
    * vocab sort), and the fit is q191's exact-moment OLS. One row:
    * n_words, slope, intercept, R².
    */
  val q210ZipfFit: QueryDef = QueryDef.sql(
    "q210_zipf_fit",
    """WITH v AS (SELECT w, count(*) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
      |r AS (SELECT c, rank() OVER (ORDER BY c DESC) AS rk FROM v),
      |xy AS (SELECT length(printf('%b', rk)) - 1 AS x,
      |    length(printf('%b', c)) - 1 AS y FROM r),
      |m AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy, sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM xy),
      |e AS (SELECT n, sx, sy,
      |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS a,
      |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS b,
      |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS c FROM m)
      |SELECT CAST(n AS BIGINT) AS n_words,
      |  round(CASE WHEN b <> 0 THEN a / b END, 6) AS slope,
      |  round(CASE WHEN b <> 0 THEN (sy - a / b * sx) / n END, 6) AS intercept,
      |  round(CASE WHEN b <> 0 AND c <> 0 THEN a * a / (b * c) END, 6) AS r2
      |FROM e""".stripMargin) { (spark, dir) =>
    val v = graft.sources.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // rank off the bounded count histogram: 1 + words with greater c
    val h = v.groupBy("c").agg(count(lit(1)).as("cnt"))
    val hw = org.apache.spark.sql.expressions.Window.orderBy(col("c").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranks = h.withColumn("rk", coalesce(sum("cnt").over(hw), lit(0L)) + 1L)
      .select("c", "rk")
    val xy = v.join(broadcast(ranks), Seq("c"))
      .select((length(bin(col("rk"))) - 1).cast("long").as("x"),
        (length(bin(col("c"))) - 1).cast("long").as("y"),
        lit("zipf").as("k"))
    graft.operators.AuditOps.olsFitDf(xy, "k", "x", "y")
      .select(col("n").as("n_words"), col("slope"), col("intercept"), col("r2"))
  }

  /** q227: BM25 document ranking for the corpus's three most
    * document-frequent terms (a deterministic stand-in for a user
    * query) — the retrieval upgrade of q89's TF-IDF: BM25's tf
    * saturation (k1 = 1.2) and length normalization (b = 0.75)
    * prevent long spammy docs from dominating. The IDF is q89's
    * fixed-point reciprocal `(N·1000) div df` (the engine's log-free
    * scoring policy — classic BM25's ln-IDF is a monotone transform
    * of it; documented deviation). Each (doc, term) contribution is
    * one fixed-order double of exact integers, micro-quantized to
    * int64 BEFORE the per-doc sum so the sum is reduction-order-free.
    *
    * Scale shape: the query relation is 3 rows (broadcast); scoring
    * is one join + hash aggregate over matching postings only;
    * top-10 is TakeOrderedAndProject.
    */
  val q227Bm25TopK: QueryDef = QueryDef.sql(
    "q227_bm25_topk",
    """WITH tf AS (SELECT doc_id, token, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |  GROUP BY doc_id, token),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(*) AS n_total FROM documents),
      |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      |ad AS (SELECT CAST(sum(dl) AS BIGINT) AS sdl, count(*) AS nd FROM dl),
      |qt AS (SELECT token, df FROM df ORDER BY df DESC, token LIMIT 3),
      |ct AS (SELECT tf.doc_id,
      |    CAST(round(1000000.0 * ((n.n_total * 1000) // qt.df)
      |      * (tf.tf * 2.2)
      |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (CAST(ad.sdl AS DOUBLE) / ad.nd)))
      |    ) AS BIGINT) AS c
      |  FROM tf JOIN qt USING (token) JOIN dl USING (doc_id)
      |  CROSS JOIN n CROSS JOIN ad),
      |sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS bm25_micro
      |  FROM ct GROUP BY doc_id)
      |SELECT doc_id, bm25_micro FROM sc
      |ORDER BY bm25_micro DESC, doc_id LIMIT 10""".stripMargin) { (spark, dir) =>
    val docsDf = graft.sources.Tables.documents(spark, dir)
    val tf = docsDf
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .scopedPersist()
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docsDf.agg(count(lit(1)).as("n_total"))
    val dl = docsDf.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    val ad = dl.agg(sum("dl").as("sdl"), count(lit(1)).as("nd"))
    val qt = df.orderBy(col("df").desc, col("token")).limit(3)
    tf.join(broadcast(qt.withColumnRenamed("df", "qdf")), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(ad))
      .withColumn("c", expr(
        """CAST(round(1000000.0 * ((n_total * 1000) div qdf)
          | * (tf * 2.2)
          | / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / nd)))
          |) AS BIGINT)""".stripMargin))
      .groupBy("doc_id").agg(sum("c").as("bm25_micro"))
      .orderBy(col("bm25_micro").desc, col("doc_id")).limit(10)
      .select("doc_id", "bm25_micro")
  }

  /** PII scrub patterns (email, IPv4, 7+-digit runs — the standard
    * first-pass redaction set for web-scraped training text). Kept
    * RE2-compatible (no backrefs/lookaround) so the same patterns run
    * on engines with RE2-class regex support.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", raw"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", raw"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digits", raw"\d{7,}", "<NUM>"))

  /** PII redaction over a text column: per-pattern match counts plus
    * the redacted text (`<out>` column). Patterns apply in the fixed
    * [[piiPatterns]] order — email first, so its digit-bearing local
    * parts aren't half-eaten by the number rule.
    *
    * Scale shape: a pure per-row projection of codegen'd
    * `regexp_count`/`regexp_replace` calls — no shuffle, no UDF;
    * at 100 TB this runs at scan throughput like the other TextOps,
    * and composes with retention pipelines as one more map stage.
    */
  def redactPii(df: org.apache.spark.sql.DataFrame, text: String,
      out: String = "text_redacted"): org.apache.spark.sql.DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(col(text), lit(pat)).cast("long"))
    }
    val redacted = piiPatterns.foldLeft(col(text)) { case (c, (_, pat, tag)) =>
      regexp_replace(c, lit(pat), lit(tag))
    }
    counted.withColumn(out, redacted)
  }

  /** q228: tokenizer fertility profile per language — the budgeting
    * numbers a tokenizer choice is judged by: characters per
    * whitespace token and regex-subword tokens per whitespace token
    * ("fertility", Ács 2019-style), per declared language. A lang
    * whose fertility is materially above the corpus norm pays that
    * multiple in sequence length for the same text.
    *
    * Scale shape: a pure per-row projection (q52's token counters)
    * feeding ONE map-side-combined hash aggregate to |langs| rows —
    * full scan throughput, no other shuffle; all ratios are exact
    * integer ppm on the aggregated sums.
    */
  val q228TokenFertility: QueryDef = QueryDef.sql(
    "q228_token_fertility",
    raw"""WITH t AS (SELECT lang, len(string_split(text, ' ')) AS toks,
         |    len(regexp_extract_all(text, '\w+|[^\w\s]')) AS subs, len(text) AS chars
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(chars) AS BIGINT) AS n_chars,
         |  CAST(CAST(sum(chars) AS HUGEINT) * 1000000 // CAST(sum(toks) AS BIGINT) AS BIGINT) AS chars_per_token_ppm,
         |  CAST(CAST(sum(subs) AS HUGEINT) * 1000000 // CAST(sum(toks) AS BIGINT) AS BIGINT) AS fertility_ppm,
         |  CAST(sum(toks) AS BIGINT) // count(*) AS tokens_per_doc
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    tokenFertilityDf(graft.sources.Tables.documents(spark, dir)).orderBy("lang")
  }

  /** The q228 fertility profile as a reusable corpus transform (also
    * the `Corpus.tokenFertility` facade).
    */
  def tokenFertilityDf(corpus: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    corpus
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        size(regexp_extract_all(col("text"), lit(raw"\w+|[^\w\s]"), lit(0)))
          .cast("long").as("subs"),
        length(col("text")).cast("long").as("chars"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
        sum("subs").as("n_subs"), sum("chars").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_chars"),
        // DECIMAL(38) headroom: per-lang char sums pass 10^13 at corpus scale
        expr("CAST(n_chars AS DECIMAL(38,0)) * 1000000 div n_tokens").as("chars_per_token_ppm"),
        expr("CAST(n_subs AS DECIMAL(38,0)) * 1000000 div n_tokens").as("fertility_ppm"),
        expr("n_tokens div n_docs").as("tokens_per_doc"))

  val all: Seq[QueryDef] = Seq(q50LangId, q51QualityScore, q52TokenCount,
    q53Fingerprint, q59RollingHashFp, q89TfidfTopk, q138PhraseSearch,
    q169TfidfDocsim, q178GopherRules, q179LangConfusion, q201SimpsonDiversity,
    q210ZipfFit, q227Bm25TopK, q228TokenFertility)
}
