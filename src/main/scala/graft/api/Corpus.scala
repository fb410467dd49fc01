package graft.api

import graft.operators.{Dedup, PipelineOps, TextOps}
import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public DataFrame-level corpus pipeline API — the operators the
  * declared queries (q40–q100) exercise, exposed as composable
  * `DataFrame => DataFrame` stages for library users.
  *
  * Input contract: a corpus relation with a unique `doc_id` (long)
  * and a `text` (string) column; other columns ride through where
  * noted. Every stage is the same scale shape the oracle-checked
  * query uses: projections stay shuffle-free, joins are broadcast or
  * bucket-keyed, and near-dup candidate generation is LSH-bucketed
  * with the hot-key skew guard.
  */
object Corpus {

  /** Add `lang_pred` (marker-voting language ID, q50 semantics). */
  def languageId(corpus: DataFrame): DataFrame =
    corpus.withColumn("lang_pred", TextOps.langPred(split(col("text"), " ")))

  /** Add `n_words`, `mean_wlen`, `stop_ratio`, `quality` (q51). */
  def qualityScore(corpus: DataFrame): DataFrame =
    TextOps.withQuality(corpus)

  /** Keep one row per distinct `text` (the lowest `doc_id`), all
    * columns preserved — q40/q54 semantics with q76's narrow
    * `md5(text)` shuffle key.
    */
  def exactDedup(corpus: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    corpus.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Near-duplicate candidate pairs `(doc_a, doc_b)` via MinHash-LSH
    * band buckets (q42), optionally verified to a minimum shingle-set
    * Jaccard similarity (q43). Pass `minJaccard = 0` to skip the
    * verify join.
    */
  def nearDupPairs(corpus: DataFrame, minJaccard: Double = 0.0): DataFrame = {
    val hashed = Dedup.hashedFromDocs(corpus)
    val pairs = Dedup.lshPairsFrom(Dedup.bandKeysFrom(hashed))
    if (minJaccard <= 0.0) pairs
    else {
      val sets = hashed.select(col("doc_id"), array_distinct(col("hs")).as("sh"))
      pairs
        .join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sa"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sb"), "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sa"), col("sb"))) /
            size(array_union(col("sa"), col("sb"))).cast("double"))
        .filter(col("jaccard") >= minJaccard)
        .select("doc_a", "doc_b", "jaccard")
    }
  }

  /** Add a deterministic `bucket` in [0, buckets) from the stable
    * doc_id hash (q75): reproducible train/held-out splits.
    */
  def sampleBucket(corpus: DataFrame, buckets: Int = 100): DataFrame =
    corpus.withColumn("bucket", TextHash.md5Bucket(col("doc_id"), buckets))

  /** Per-document benchmark-overlap probe (q77): fraction of the
    * doc's distinct 3-word shingles present in `benchmark`'s shingle
    * vocabulary. The benchmark side is broadcast; returns
    * `(doc_id, n_sh, n_hit, overlap)` for docs with any overlap.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame): DataFrame = {
    def sh(df: DataFrame) = df
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"),
        explode(array_distinct(TextHash.shingleHashesFromWords(col("ws")))).as("h"))
    val bench = sh(benchmark).select("h").distinct()
    sh(corpus)
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_hit"))
      .filter(col("n_hit") > 0)
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        round(col("n_hit") * 1.0 / col("n_sh"), 6).as("overlap"))
  }

  /** Per-`source` mixture report (q78): doc/token/BPE-estimate
    * totals, corpus share, and mean quality. Shares and means are
    * floor-ppm integers divided once by 1e6 — exact at any reduction
    * order, and with no round() there is no cross-engine rounding
    * boundary to land on (the q51 ppm policy).
    */
  def mixtureReport(corpus: DataFrame): DataFrame =
    TextOps.withQuality(corpus)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("n_tokens"),
        sum(ceil(length(col("text")) / 4.0).cast("long")).as("bpe_est"),
        sum("quality_ppm").as("qsum"))
      .withColumn("total", sum(col("n_docs")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("bpe_est"),
        (expr("n_docs * 1000000 div total") / lit(1e6)).as("doc_share"),
        (expr("qsum div n_docs") / lit(1e6)).as("avg_quality"))

  /** Top-k vocabulary (q74): token occurrence + document frequency,
    * total-ordered cut.
    */
  def vocabTopK(corpus: DataFrame, k: Int = 50): DataFrame =
    corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occur"), countDistinct("doc_id").as("n_docs"))
      .orderBy(col("n_occur").desc, col("token"))
      .limit(k)

  /** Per-document chunk-dedup census (q93): fixed `chunkWords`-word
    * chunks, corpus document frequency on the chunk hash, chunks in
    * >= `boilerplateDf` docs counted as dropped. Returns
    * `(doc_id, n_chunks, n_kept, kept_frac)`.
    */
  def chunkDedup(corpus: DataFrame, chunkWords: Int = 4,
      boilerplateDf: Int = 3): DataFrame =
    PipelineOps.chunkDedupDf(corpus, chunkWords, boilerplateDf)

  /** Per-document unigram surprisal in exact integer bits (q95):
    * `(doc_id, n_tokens, bits_sum, avg_bits)` against the corpus's
    * own unigram distribution. Lazy and uncached — persist the plan at
    * your own scope if you evaluate it more than once.
    */
  def surprisalBits(corpus: DataFrame): DataFrame =
    PipelineOps.surprisalBitsDf(corpus)

  /** Temperature-weighted per-source sampling rates (q96, alpha=0.5):
    * `(source, n_docs, n_tokens, rate_ppm)` — exact fixed-point ppm,
    * apply with [[sampleBucket]] membership `bucket < rate_ppm` over
    * one million buckets.
    */
  def mixtureRates(corpus: DataFrame): DataFrame =
    PipelineOps.mixtureRatesDf(corpus)

  /** Cross-document repeated spans (q100): `spanWords`-word spans in
    * >= 2 distinct docs, with the min=max exactness witness.
    */
  def repeatedSpans(corpus: DataFrame, spanWords: Int = 8): DataFrame =
    PipelineOps.repeatedSpansDf(corpus, spanWords)

  /** Bigram collocation lift in exact ppm (q150): pairs seen at
    * least `minPair` times with their unigram factors.
    */
  def collocationLift(corpus: DataFrame, minPair: Long = 5): DataFrame =
    graft.operators.AuditOps.collocationLiftDf(corpus, minPair)

  /** Dedup saturation curve over `buckets` deterministic ingest
    * tranches (q151): cumulative rows, distinct hashes, dup ppm.
    */
  def dedupSaturation(corpus: DataFrame, buckets: Long = 10): DataFrame =
    graft.operators.AuditOps.dedupSaturationDf(corpus, buckets)

  /** Per-document `k`-gram novelty in exact ppm (q152). */
  def ngramNovelty(corpus: DataFrame, k: Int = 3): DataFrame =
    graft.operators.AuditOps.ngramNoveltyDf(corpus, k)

  /** Cross-source span-overlap matrix with containment ppm vs the
    * smaller side (q153).
    */
  def sourceOverlap(corpus: DataFrame, spanWords: Int = 8): DataFrame =
    graft.operators.AuditOps.sourceOverlapDf(corpus, spanWords)

  /** Cross-source unigram cross-entropy matrix in exact integer
    * bits (q163).
    */
  def domainXent(corpus: DataFrame): DataFrame =
    graft.operators.AuditOps.domainXentDf(corpus)

  /** Per-document boilerplate fraction — the share of a doc's word
    * spans duplicated elsewhere in the corpus, integer ppm (q184).
    */
  def boilerplate(corpus: DataFrame, spanWords: Int = 8): DataFrame =
    graft.operators.PipelineOps.boilerplateDf(corpus, spanWords)

  /** Label-independence screen: chi-square contingency audit over
    * two label columns, e.g. source × lang (q189).
    */
  def chiSquare(corpus: DataFrame, rowCol: String = "source",
      colCol: String = "lang"): DataFrame =
    graft.operators.AuditOps.chiSquareDf(corpus, rowCol, colCol)

  /** Antitonic (PAVA) calibration of a bucketed rate curve (q193). */
  def calibrate(hist: DataFrame, bucket: String, weight: String,
      hits: String): DataFrame =
    graft.operators.AuditOps.isotonicDf(hist, bucket, weight, hits)

  /** Per-language tokenizer fertility profile — chars/token and
    * subwords-per-word in exact integer ppm (q228).
    */
  def tokenFertility(corpus: DataFrame): DataFrame =
    graft.operators.TextOps.tokenFertilityDf(corpus)

  /** Vocabulary coverage / OOV curve over the frequency-of-frequency
    * histogram (q229).
    */
  def oovCurve(corpus: DataFrame): DataFrame =
    graft.operators.CorpusOps.oovCurveDf(corpus)

  /** PII redaction (email/IPv4/digit-run) with per-pattern counts —
    * a pure codegen projection, no shuffle.
    */
  def redactPii(corpus: DataFrame, text: String = "text",
      out: String = "text_redacted"): DataFrame =
    graft.operators.TextOps.redactPii(corpus, text, out)

  /** Per-shard manifest (q237): boundary docs, doc/token counts,
    * budget fill ratio, and source mix for every token-budget shard —
    * the loader-facing index over the q81 assignment.
    */
  def shardManifest(corpus: DataFrame): DataFrame =
    graft.operators.CorpusOps.shardManifestDf(corpus)

  /** O(delta) manifest maintenance (q243): update a stored
    * [[shardManifest]] for an APPENDED batch without rescanning the
    * base corpus. `baseTot` is the stored per-shard relation
    * `(shard, first_doc, last_doc, n_docs, n_tokens)`, `baseBySrc`
    * the stored `(shard, source, src_docs)` relation, `delta` the new
    * docs (ids beyond the base). Incremental ≡ rebuild: the appended
    * prefix sum continues at the base's token total, so the result
    * equals [[shardManifest]] of the concatenated corpus (q243's
    * oracle pins exactly that).
    */
  def manifestDelta(baseTot: DataFrame, baseBySrc: DataFrame,
      delta: DataFrame): DataFrame =
    graft.operators.CorpusOps.manifestMergeFrom(baseTot, baseBySrc, delta)

  /** The stored-table update behind [[manifestDelta]]: the post-append
    * `(per-shard totals, per-(shard, source) counts)` a pipeline
    * persists as the NEXT batch's `baseTot`/`baseBySrc`. Write these
    * after every batch and the O(delta) loop composes indefinitely —
    * generation k's incremental manifest equals the from-scratch
    * rebuild of everything ingested so far.
    */
  def manifestDeltaTables(baseTot: DataFrame, baseBySrc: DataFrame,
      delta: DataFrame): (DataFrame, DataFrame) =
    graft.operators.CorpusOps.manifestTablesFrom(baseTot, baseBySrc, delta)
}
