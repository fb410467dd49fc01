package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch / approximate-analytics operators: the bounded-state
  * summaries a 100 TB pipeline uses where exact answers would shuffle
  * the full value set. Each query also emits the exact answer (cheap
  * at test scale) so the sketch error is visible in the output and
  * the whole thing stays oracle-checkable — the sketches here are
  * DETERMINISTIC (hash-defined, order-insensitive), so DuckDB can
  * replay them bit-for-bit with plain SQL.
  */
object Sketches {

  private def md5p32(c: Column): Column =
    GraftExpressionBridge.column(
      graft.functions.Md5Prefix32(GraftExpressionBridge.expression(c)))

  /** KMV distinct-token estimate per source vs the exact count.
    *
    * Scale shape: ONE hash aggregation keyed by source; the KMV state
    * is a ≤ k-long sorted array merged map-side
    * ([[graft.functions.KmvSketchAgg]]), so the shuffle carries a few
    * hundred bytes per (partition, source) — the exact `countDistinct`
    * beside it is the test-scale reference answer. Estimate =
    * (k-1)·2^32 / kth_min once the sketch is full, else exact-by-
    * construction.
    */
  val SketchK = 64

  val q84KmvDistinct: QueryDef = QueryDef.sql(
    "q84_kmv_distinct",
    s"""WITH t AS (SELECT DISTINCT source, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM t)
       |SELECT source, count(*) AS n_exact,
       |  max(CASE WHEN rn <= $SketchK THEN h END) AS kth_hash,
       |  round(CASE WHEN count(CASE WHEN rn <= $SketchK THEN 1 END) < $SketchK
       |    THEN CAST(count(CASE WHEN rn <= $SketchK THEN 1 END) AS DOUBLE)
       |    ELSE ${SketchK - 1}.0 * 4294967296.0 / max(CASE WHEN rn <= $SketchK THEN h END)
       |    END, 4) AS est_distinct
       |FROM r GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    val kmv = udaf(new graft.functions.KmvSketchAgg(SketchK))
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .select(col("source"), md5p32(col("token")).as("h"))
    toks.groupBy("source")
      .agg(countDistinct("h").as("n_exact"), kmv(col("h")).as("ks"))
      .select(col("source"), col("n_exact"),
        element_at(col("ks"), -1).as("kth_hash"),
        round(when(size(col("ks")) < SketchK, size(col("ks")).cast("double"))
          .otherwise(lit((SketchK - 1).toDouble) * lit(4294967296.0) /
            element_at(col("ks"), -1)), 4).as("est_distinct"))
      .orderBy("source")
  }

  /** HyperLogLog distinct-count per source — the register-based
    * complement to q84's KMV (HLL state is m fixed bytes and merges
    * by register-max, the industry default for planet-scale distinct
    * counts; KMV keeps k exact minima and admits an exact small-set
    * mode). m = 2^12 registers from the top 12 hash bits; the rank is
    * the leftmost-1 position of the remaining 20 bits, computed as an
    * exact integer via binary-string length (the q95/q109 trick).
    *
    * Determinism without quantization: every register value is an
    * integer max (order-insensitive), each register contributes the
    * EXACT dyadic 1/2^rho (reciprocal of a shifted integer — IEEE
    * exact), and the sum of ≤ 4096 dyadics spanning 2^-21..2^0 stays
    * far inside the 53-bit mantissa, so the harmonic sum is exact at
    * ANY reduction order. The final αm²/sum is one IEEE division of
    * identical inputs on both engines — emitted UNROUNDED like q110.
    *
    * The emitted `raw_est` is the UNCORRECTED harmonic estimate: the
    * standard small-range linear-counting branch needs `ln`, whose
    * last-ulp can differ between libm and the JVM, so the oracle row
    * carries the deterministic state (raw_est + n_zero) and
    * [[hllCorrected]] applies the correction engine-side
    * (SketchesSpec pins its accuracy against the exact count).
    *
    * Scale shape: one map-side-combined (source, bucket) max, one
    * tiny per-source rollup. The register relation is ≤ m rows per
    * source regardless of corpus size.
    */
  val HllBuckets = 4096
  val q135HllDistinct: QueryDef = {
    val alphaM2 = 0.7213 / (1.0 + 1.079 / HllBuckets) * HllBuckets.toDouble * HllBuckets.toDouble
    val aLit = graft.functions.KernelOracles.lit(alphaM2)
    QueryDef.sql(
      "q135_hll_distinct",
      s"""WITH t AS (SELECT source, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)),
         |b AS (SELECT source, h >> 20 AS bucket,
         |    CASE WHEN (h & 1048575) = 0 THEN 21
         |         ELSE 21 - length(printf('%b', h & 1048575)) END AS rho
         |  FROM t),
         |r AS (SELECT source, bucket, max(rho) AS reg FROM b GROUP BY source, bucket),
         |s AS (SELECT source, count(*) AS n_reg,
         |    sum(1e0 / (1::BIGINT << reg)) AS sp FROM r GROUP BY source)
         |SELECT source, CAST(n_reg AS BIGINT) AS n_registers,
         |  CAST($HllBuckets - n_reg AS BIGINT) AS n_zero,
         |  $aLit / (sp + ($HllBuckets - n_reg)) AS raw_est
         |FROM s ORDER BY source""".stripMargin) { (spark, dir) =>
      val toks = Tables.documents(spark, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
        .select(col("source"), md5p32(col("token")).as("h"))
      val rest = col("h").bitwiseAND(lit(1048575L))
      val regs = toks
        .select(col("source"), shiftright(col("h"), 20).as("bucket"),
          when(rest === 0, lit(21)).otherwise(lit(21) - length(bin(rest))).as("rho"))
        .groupBy("source", "bucket").agg(max("rho").as("reg"))
      regs.groupBy("source")
        .agg(count(lit(1)).as("n_reg"),
          sum(lit(1.0) / expr("shiftleft(1L, cast(reg as int))")).as("sp"))
        .select(col("source"), col("n_reg").as("n_registers"),
          (lit(HllBuckets.toLong) - col("n_reg")).as("n_zero"),
          (lit(alphaM2) / (col("sp") + (lit(HllBuckets.toLong) - col("n_reg"))))
            .as("raw_est"))
        .orderBy("source")
    }
  }

  /** KMV SET ALGEBRA — the reason KMV beats HLL for overlap
    * analytics: two sources' k-minima sketches compose into union
    * AND intersection distinct estimates without touching the data
    * again. Union sketch = k smallest of the merged minima sets;
    * |A∪B| from its k-th min (exact below k); the intersection uses
    * the standard ratio estimator — the fraction of union minima
    * present in BOTH sketches — scaled by the union estimate.
    *
    * Determinism: every ingredient is a set operation on integer
    * hashes (order-insensitive) and the two estimates are IEEE
    * expressions over those exact inputs with identical op order on
    * both engines — emitted UNROUNDED.
    *
    * Scale shape: the sketch relation is one tiny row per source
    * (built in ONE map-side-combined pass over the corpus); the
    * pair comparison is a broadcast theta self-join of that
    * celebrity-sized relation (n_sources² pairs of ≤ k-element
    * arrays), never a corpus join.
    */
  val q137KmvSetAlgebra: QueryDef = QueryDef.sql(
    "q137_kmv_set_algebra",
    s"""WITH t AS (SELECT DISTINCT source, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM t),
       |sk AS (SELECT source, h FROM r WHERE rn <= $SketchK),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pairs AS (SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |u0 AS (SELECT p.sa, p.sb, s.h FROM pairs p JOIN sk s ON s.source = p.sa
       |  UNION
       |  SELECT p.sa, p.sb, s.h FROM pairs p JOIN sk s ON s.source = p.sb),
       |ur AS (SELECT sa, sb, h,
       |    row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn FROM u0),
       |um AS (SELECT sa, sb, h FROM ur WHERE rn <= $SketchK),
       |st AS (SELECT sa, sb, count(*) AS ku, max(h) AS tau FROM um GROUP BY sa, sb),
       |cm AS (SELECT u.sa, u.sb, count(*) AS c FROM um u
       |  JOIN sk x ON x.source = u.sa AND x.h = u.h
       |  JOIN sk y ON y.source = u.sb AND y.h = u.h
       |  GROUP BY u.sa, u.sb),
       |e AS (SELECT st.sa, st.sb, st.ku, coalesce(cm.c, 0) AS c,
       |    CASE WHEN st.ku < $SketchK THEN CAST(st.ku AS DOUBLE)
       |         ELSE ${SketchK - 1}.0 * 4294967296.0 / st.tau END AS est_union
       |  FROM st LEFT JOIN cm ON cm.sa = st.sa AND cm.sb = st.sb)
       |SELECT sa, sb, CAST(ku AS BIGINT) AS k_union, CAST(c AS BIGINT) AS k_common,
       |  est_union, CAST(c AS DOUBLE) * est_union / ku AS est_intersect
       |FROM e ORDER BY sa, sb""".stripMargin) { (spark, dir) =>
    val kmv = udaf(new graft.functions.KmvSketchAgg(SketchK))
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .select(col("source"), md5p32(col("token")).as("h"))
    val sk = toks.groupBy("source").agg(kmv(col("h")).as("ks"))
    val j = sk.select(col("source").as("sa"), col("ks").as("ka"))
      .join(sk.select(col("source").as("sb"), col("ks").as("kb")),
        col("sa") < col("sb"))
    val withU = j
      .withColumn("um", slice(array_sort(array_union(col("ka"), col("kb"))), 1, SketchK))
      .withColumn("ku", size(col("um")).cast("long"))
      .withColumn("c",
        size(array_intersect(array_intersect(col("um"), col("ka")), col("kb"))).cast("long"))
      .withColumn("est_union",
        when(col("ku") < SketchK, col("ku").cast("double"))
          .otherwise(lit((SketchK - 1).toDouble) * lit(4294967296.0) /
            element_at(col("um"), -1)))
    withU.select(col("sa"), col("sb"), col("ku").as("k_union"), col("c").as("k_common"),
        col("est_union"),
        (col("c").cast("double") * col("est_union") / col("ku")).as("est_intersect"))
      .orderBy("sa", "sb")
  }

  /** Flajolet et al.'s small-range correction over the q135 state:
    * below 2.5·m with empty registers, linear counting `m·ln(m/V)`
    * (V = zero registers) replaces the biased raw harmonic estimate.
    * Engine-side only — `ln` is not cross-engine bit-stable, which is
    * why the oracle row carries the raw pieces instead.
    */
  def hllCorrected(nZero: Long, rawEst: Double): Double =
    if (rawEst <= 2.5 * HllBuckets && nZero > 0)
      HllBuckets * math.log(HllBuckets.toDouble / nZero)
    else rawEst

  /** Distributed histogram percentiles (p50/p95 per series): values
    * quantized to integer milli-units, ONE (user, bin) count
    * aggregate with map-side combine, then the quantile is the first
    * bin whose cumulative count crosses ⌈q·n⌉ — the scalable
    * percentile pattern (an exact sort-based percentile would
    * range-shuffle the full 100 TB; the histogram shuffles one row
    * per occupied bin). Integer counts + integer bins ⇒ bit-identical
    * on any partitioning and in DuckDB.
    */
  val q86HistQuantile: QueryDef = QueryDef.sql(
    "q86_hist_quantile",
    s"""WITH b AS (SELECT user_id, CAST(round(value * 1000.0) AS BIGINT) AS vm
       |  FROM (${Tables.seriesSql}) WHERE value IS NOT NULL),
       |c AS (SELECT user_id, vm, count(*) AS cnt FROM b GROUP BY user_id, vm),
       |w AS (SELECT user_id, vm,
       |  CAST(sum(cnt) OVER (PARTITION BY user_id ORDER BY vm
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |  CAST(sum(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM c)
       |SELECT user_id, max(n) AS n_rows,
       |  min(CASE WHEN cum >= ceil(n * 0.5) THEN vm END) / 1000.0 AS p50,
       |  min(CASE WHEN cum >= ceil(n * 0.95) THEN vm END) / 1000.0 AS p95
       |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val b = Tables.series(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), round(col("value") * lit(1e3)).cast("bigint").as("vm"))
    val c = b.groupBy("user_id", "vm").agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy("user_id").orderBy("vm")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("user_id")
    c.withColumn("cum", sum("cnt").over(cum))
      .withColumn("n", sum("cnt").over(whole))
      .groupBy("user_id")
      .agg(max("n").as("n_rows"),
        (min(when(col("cum") >= ceil(col("n") * lit(0.5)), col("vm"))) / lit(1e3)).as("p50"),
        (min(when(col("cum") >= ceil(col("n") * lit(0.95)), col("vm"))) / lit(1e3)).as("p95"))
      .orderBy("user_id")
  }

  /** Count-Min frequency sketch, probed with the 20 most frequent
    * tokens against their exact counts.
    *
    * The sketch matrix (depth 4 × width 256 salted-hash buckets) is
    * ONE map-side-combined count aggregate — D·W rows summarizing an
    * arbitrarily large corpus, broadcast to the probe join. Merge
    * across partitions is counter addition (associative), estimates
    * are min-over-rows: integers end-to-end, so the overestimate
    * guarantee (`cm_est >= n_exact`) and the exact values replay
    * identically in DuckDB. At 100 TB the matrix relation IS the
    * deliverable (vocab pruning / heavy-hitter pre-filter); the probe
    * side here doubles as its accuracy report.
    */
  val CmDepth = 4
  val CmWidth = 256
  val CmProbes = 20

  val q90CmFreq: QueryDef = QueryDef.sql(
    "q90_cm_freq",
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |js AS (SELECT unnest([${(0 until CmDepth).mkString(", ")}]) AS j),
       |cm AS (SELECT j, ('0x' || substr(md5(CAST(j AS VARCHAR) || token), 1, 8))::BIGINT
       |    % $CmWidth AS b, count(*) AS c
       |  FROM toks CROSS JOIN js GROUP BY j, b),
       |ex AS (SELECT token, count(*) AS n_exact FROM toks GROUP BY token
       |  ORDER BY n_exact DESC, token LIMIT $CmProbes),
       |pb AS (SELECT token, n_exact, j,
       |    ('0x' || substr(md5(CAST(j AS VARCHAR) || token), 1, 8))::BIGINT % $CmWidth AS b
       |  FROM ex CROSS JOIN js)
       |SELECT pb.token, pb.n_exact, CAST(min(cm.c) AS BIGINT) AS cm_est
       |FROM pb JOIN cm ON pb.j = cm.j AND pb.b = cm.b
       |GROUP BY pb.token, pb.n_exact
       |ORDER BY n_exact DESC, token""".stripMargin) { (spark, dir) =>
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    def bucket(tok: Column, j: Int): Column =
      md5p32(concat(lit(j.toString), tok)) % CmWidth
    val jb = (0 until CmDepth).map(j =>
      struct(lit(j).as("j"), bucket(col("token"), j).as("b")))
    val cm = toks
      .select(explode(array(jb: _*)).as("jb"))
      .select(col("jb.j").as("j"), col("jb.b").as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
    val probes = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(CmProbes)
    probes
      .select(col("token"), col("n_exact"), explode(array(jb: _*)).as("jb"))
      .select(col("token"), col("n_exact"), col("jb.j").as("j"), col("jb.b").as("b"))
      .join(broadcast(cm), Seq("j", "b"))
      .groupBy("token", "n_exact").agg(min("c").as("cm_est"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** Misra-Gries counter budget for q187. 39 counters ⇒ every token
    * with share > 1/40 (2.5%) of the stream is GUARANTEED a counter
    * in the merged sketch (deficit ≤ n/(k+1) under any partitioning).
    */
  val MgK = 39

  /** q187: exact heavy hitters via a Misra-Gries candidate pass —
    * the frequent-items sketch the engine was missing beside
    * KMV/HLL/CM. Pass 1 folds the corpus into one ≤39-counter
    * summary (map-side-combined, bounded state); the counter KEYS are
    * a guaranteed superset of every token with share > 1/40, so pass
    * 2 exact-counts only those candidates and applies the threshold
    * exactly. Output is therefore deterministic (sketch order-
    * sensitivity never leaks — same candidates-then-verify shape as
    * the LSH dedup), and the oracle is the plain exact query.
    *
    * Scale shape: pass 1 never shuffles more than k counters per
    * partition; pass 2's aggregate is over candidate tokens only
    * (≤ k keys). The ≤39-entry driver collect is the IVF-codebook
    * kind: bounded by the sketch parameter, not the data.
    */
  val q187HeavyHitters: QueryDef = QueryDef.sql(
    "q187_heavy_hitters",
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |n AS (SELECT count(*) AS n FROM w),
       |c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word)
       |SELECT c.word, CAST(c.cnt AS BIGINT) AS cnt,
       |  1000000 * c.cnt // n.n AS share_ppm
       |FROM c, n WHERE c.cnt * ${MgK + 1} > n.n ORDER BY word""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val st = words.as[String]
      .select(new graft.functions.MisraGriesAgg(MgK).toColumn).head()
    val cands = st.counters.keys.toSeq.sorted
    words.filter(col("word").isin(cands: _*))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (MgK + 1) > st.n)
      .select(col("word"), col("cnt"),
        expr(s"1000000L * cnt div ${st.n}L").as("share_ppm"))
      .orderBy("word")
  }

  def all: Seq[QueryDef] = Seq(q84KmvDistinct, q86HistQuantile, q90CmFreq,
    q135HllDistinct, q137KmvSetAlgebra, q187HeavyHitters)
}
