package graft.operators

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level operations a large-scale training-data pipeline runs
  * after the per-document analyses in [[TextOps]]: vocabulary
  * statistics, deterministic sampling, and the composed
  * dedup → language → quality retention pipeline.
  *
  * Scale shapes:
  *   - vocabulary: explode + hash aggregate benefits from map-side
  *     partial aggregation (token counts collapse before the
  *     shuffle); the top-k is `TakeOrderedAndProject`, never a full
  *     sort;
  *   - sampling: a pure per-row projection on a content-stable hash —
  *     zero shuffle, reproducible across runs and cluster layouts,
  *     which is what makes held-out splits auditable;
  *   - retention: one window over `md5(text)` (narrow 32-char shuffle
  *     key instead of the full document, same grouping) feeding one
  *     hash aggregate; quality means are quantized to integer
  *     micro-units before summing so the float result is independent
  *     of partial-aggregation order on both engines.
  */
object CorpusOps {

  private def docs(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.sources.Tables.documents(spark, dir)

  /** Vocabulary top-k: token occurrence and document frequency for
    * the 50 most frequent whitespace tokens (ties broken by token so
    * the cut is total-ordered and deterministic).
    */
  val q74VocabTopk: QueryDef = QueryDef.sql(
    "q74_vocab_topk",
    """SELECT token, count(*) AS n_occur, count(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n_occur DESC, token LIMIT 50""".stripMargin) { (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occur"), countDistinct("doc_id").as("n_docs"))
      .orderBy(col("n_occur").desc, col("token"))
      .limit(50)
  }

  /** Deterministic 10% corpus sample: keep documents whose md5-based
    * bucket (over the stable `doc_id`) falls under the rate. The
    * split is a pure projection — reproducible regardless of
    * partitioning, executor count, or input order, so train/held-out
    * membership is auditable. Stratified variants just bucket within
    * a partition column.
    */
  val q75CorpusSample: QueryDef = QueryDef.sql(
    "q75_corpus_sample",
    """SELECT doc_id,
      |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
      |FROM documents
      |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 10
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    docs(spark, dir)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < 10)
      .select("doc_id", "bucket")
      .orderBy("doc_id")
  }

  /** Retention pipeline: exact-dedup (keep the lowest doc_id per
    * `md5(text)` group), predict language, score quality, retain
    * canonical docs above the quality bar, and report per-language
    * retained counts and mean quality. The mean is an integer
    * micro-unit sum (order-insensitive) divided at the end.
    */
  val q76RetentionPipeline: QueryDef = QueryDef.sql(
    "q76_retention_pipeline",
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws,
       |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM documents),
       |m AS (SELECT doc_id, ws, rn, len(ws) AS n_words,
       |    list_reduce(list_transform(ws, x -> len(x)), (s, x) -> s + x) / len(ws) AS mean_wlen,
       |    len(list_filter(ws, x -> list_contains(${TextOps.sqlList(TextOps.stopwords, "[", "]")}, x))) / len(ws) AS stop_ratio
       |  FROM w),
       |q AS (SELECT doc_id, ws, rn,
       |    round(0.4 * stop_ratio + 0.3 * least(mean_wlen / 8, 1.0)
       |      + 0.3 * least(n_words / 100.0, 1.0), 6) AS quality
       |  FROM m),
       |l AS (SELECT doc_id, rn, quality, ${TextOps.duckLangCase} AS lang_pred FROM q)
       |SELECT lang_pred, count(*) AS n_retained,
       |  round(CAST(sum(CAST(round(quality * 1e6) AS BIGINT)) AS DOUBLE) / count(*) / 1e6, 6) AS avg_quality
       |FROM l WHERE rn = 1 AND quality >= 0.35
       |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    docs(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")))
      .withColumn("mean_wlen",
        expr("aggregate(ws, 0, (s, x) -> s + length(x))") / col("n_words"))
      .withColumn("stop_ratio",
        expr(s"size(filter(ws, x -> array_contains(${TextOps.sqlList(TextOps.stopwords, "array(", ")")}, x)))") /
          col("n_words"))
      .withColumn("quality",
        round(lit(0.4) * col("stop_ratio")
          + lit(0.3) * least(col("mean_wlen") / 8, lit(1.0))
          + lit(0.3) * least(col("n_words") / 100.0, lit(1.0)), 6))
      .withColumn("lang_pred", TextOps.langPred(col("ws")))
      .filter(col("rn") === 1 && col("quality") >= 0.35)
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_retained"),
        sum(round(col("quality") * 1e6).cast("long")).as("qsum"))
      .select(col("lang_pred"), col("n_retained"),
        round(col("qsum").cast("double") / col("n_retained") / 1e6, 6).as("avg_quality"))
      .orderBy("lang_pred")
  }

  val all: Seq[QueryDef] = Seq(q74VocabTopk, q75CorpusSample, q76RetentionPipeline)
}
