package graft.api

import graft.functions.VectorMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public DataFrame-level embedding/similarity API — the shapes the
  * declared queries (q45–q48, q67–q68) exercise, exposed as
  * composable stages for library users.
  *
  * Input contract: a relation with `vec_id` (long, unique) and
  * `embedding` (`array<float>`). Dot products fold left in doubles so
  * results are deterministic under any partitioning.
  *
  * Scale shapes: query sides broadcast; candidate generation is
  * bucket- or list-keyed equi-joins (never all-pairs); assignment
  * stages are per-row codebook scans over broadcast-size centroid
  * sets (no explode, no window).
  */
object Vectors {

  private def bridge(e: Column) =
    org.apache.spark.sql.GraftExpressionBridge.expression(e)
  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftExpressionBridge.column(e)

  private def dotSql(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)),
       |  cast(0 as double), (s, x) -> s + x)""".stripMargin

  private def normSql(a: String): String =
    s"""aggregate($a, cast(0 as double),
       |  (s, x) -> s + cast(x as double) * cast(x as double))""".stripMargin

  /** Cosine similarity of two `array<float>` columns (left-fold). */
  /** Per-vector simplified silhouette of the trained k-means
    * clustering over a scale-factor dir (q200).
    */
  def silhouette(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.q200Silhouette.fn(spark, dir)

  def cosine(a: String, b: String): Column =
    expr(dotSql(a, b)) / (sqrt(expr(normSql(a))) * sqrt(expr(normSql(b))))

  /** Exact cosine top-k: for each query row, the k nearest corpus
    * rows (queries broadcast; one corpus scan — the baseline every
    * ANN variant is judged against). Returns
    * `(q_id, vec_id, cos_sim, rank)`.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", round(cosine("qe", "embedding"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "cos_sim", "rank")
  }

  /** Add the 8-bit random-hyperplane LSH `bucket` (q46) — a native
    * per-row loop over the shared plane constants; candidate
    * generation is then an equi-join on `bucket`.
    */
  def hyperplaneBuckets(df: DataFrame): DataFrame =
    df.withColumn("bucket", colOf(graft.functions.HyperplaneBucket(
      bridge(col("embedding")), VectorMath.planes.map(_.map(_.toDouble)))))

  /** Bucket-restricted near-duplicate pairs (q48): only rows sharing
    * a hyperplane bucket are compared; pairs at or above `minCos`
    * survive. Returns `(vec_a, vec_b, cos_sim)`.
    */
  def nearDupPairs(df: DataFrame, minCos: Double = 0.999): DataFrame = {
    val bk = hyperplaneBuckets(df).select("bucket", "vec_id", "embedding").persist()
    // each side rename-projects BEFORE the join: dataset-alias self
    // joins (`bk.as("x")`) resolve both `x.vec_id` and `y.vec_id` to
    // the same attribute under some cached/reused plans, silently
    // turning `x < y` into `v < v` = empty (observed flipping with
    // driver heap size via plan-reuse differences)
    val left = bk.select(col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val right = bk.select(col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    left.join(right, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine("emb_a", "emb_b"), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }

  /** Assign each row its nearest coarse centroid(s): argmin L2 over a
    * driver-side codebook via the native per-row scan (q67's shape —
    * no explode, no window). `nprobe = 1` adds `list_id`; larger
    * `nprobe` adds a `list_ids` array (the multi-probe query side).
    */
  def ivfAssign(df: DataFrame, centroids: Seq[(Long, Seq[Float])],
      nprobe: Int = 1): DataFrame = {
    val sorted = centroids.sortBy(_._1)
    val nearest = colOf(graft.functions.NearestCentroids(
      bridge(col("embedding")), sorted.map(_._1), sorted.map(_._2), nprobe))
    if (nprobe == 1) df.withColumn("list_id", element_at(nearest, 1))
    else df.withColumn("list_ids", nearest)
  }
}
