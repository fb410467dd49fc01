package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-model operators over the events stream: Markov chains
  * (stationary mix, removal-effect attribution), statistical tests
  * and intervals (Welch t, derandomized bootstrap, CUPED), digit-law
  * and concentration audits (Benford, Gini, trimmed mean), survival
  * tables, SCD2 history, association rules and sequence motifs. All
  * follow the engine's integer-exact determinism policy — emitted
  * numbers are integer aggregates, single integer divisions, or
  * fixed-order doubles of exact integers — so the DuckDB oracle hash
  * is stable on any engine and any reduction order.
  */
object BehaviorOps {

  private val S =
    s"""WITH s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |FROM (${Tables.seriesSql}))""".stripMargin

  private val OW = "PARTITION BY user_id ORDER BY tn, event_id"

  // ---------------------------------------------------------------------
  // q181: stationary distribution of the empirical event-type chain
  // ---------------------------------------------------------------------

  /** Power-iteration rounds. Fixed (not run-to-convergence) so the
    * oracle can replay the identical integer iterations as a CTE
    * chain — the same contract as q122's PageRank and q170's power
    * iteration.
    */
  val MarkovIters = 12

  /** q181: the long-run event mix — the stationary distribution of
    * the first-order event-type Markov chain, estimated by
    * `MarkovIters` integer power-iteration steps from the uniform
    * vector. Transition probabilities are ppm-quantized ONCE
    * (`p_ppm = 1e6·n_ij div n_i`), then each step is
    * `π'(j) = Σ_i (π(i)·p_ppm(i,j)) div 1e6` — all int64, overflow-
    * safe to n_ij ≈ 1e12 rows per cell, bit-deterministic.
    *
    * Scale shape: the transition COUNTS are one hash aggregate with
    * map-side combine (bounded by |event_type|² cells, not row
    * count); the ≤K² ppm matrix is collected and iterated on the
    * driver — the same bounded-by-value-domain collect as the IVF
    * codebook (Similarity.scala), K² integers regardless of corpus
    * size. No per-iteration shuffle at all.
    */
  val q181MarkovStationary: QueryDef = {
    val iterCtes = (1 to MarkovIters).map { i =>
      s"""it$i AS (SELECT t.to_type AS node,
         |    CAST(sum(p.pi * t.p_ppm // 1000000) AS BIGINT) AS pi
         |  FROM tr t JOIN it${i - 1} p ON p.node = t.from_type
         |  GROUP BY t.to_type)""".stripMargin
    }
    QueryDef.sql(
      "q181_markov_stationary",
      s"""$S, pr AS (SELECT event_type AS from_type,
         |    lead(event_type) OVER ($OW) AS to_type FROM s),
         |cn AS (SELECT from_type, to_type, count(*) AS n FROM pr
         |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
         |tr AS (SELECT from_type, to_type,
         |    1000000 * n // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
         |  FROM cn),
         |st AS (SELECT DISTINCT from_type FROM tr),
         |it0 AS (SELECT from_type AS node,
         |    CAST(1000000 // (SELECT count(*) FROM st) AS BIGINT) AS pi FROM st),
         |${iterCtes.mkString(",\n")}
         |SELECT node AS event_type, pi AS pi_ppm
         |FROM it$MarkovIters ORDER BY event_type""".stripMargin) { (spark, dir) =>
      markovStationaryDf(spark, Tables.seriesNorm(spark, dir), MarkovIters)
        .orderBy("event_type")
    }
  }

  /** The q181 computation as a reusable stage: ppm transition matrix
    * via one bounded aggregate, then the K×K integer iteration on the
    * collected matrix (K = |event_type| — value-domain-bounded).
    */
  def markovStationaryDf(spark: SparkSession, series: DataFrame,
      iters: Int = MarkovIters): DataFrame = {
    val ow = Window.partitionBy("user_id").orderBy("tn", "event_id")
    val cn = series
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(ow).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val tr = cn.withColumn("p_ppm",
        expr("1000000L * n div sum(n) over (partition by from_type)"))
      .select("from_type", "to_type", "p_ppm")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val fromStates = tr.map(_._1).distinct.sorted
    var pi: Map[String, Long] =
      fromStates.map(_ -> 1000000L / fromStates.length).toMap
    (1 to iters).foreach { _ =>
      pi = tr.filter(t => pi.contains(t._1))
        .groupBy(_._2)
        .map { case (to, ts) =>
          to -> ts.map(t => pi(t._1) * t._3 / 1000000L).sum
        }
    }
    import spark.implicits._
    pi.toSeq.toDF("event_type", "pi_ppm")
  }

  // ---------------------------------------------------------------------
  // q182: Benford first-digit audit
  // ---------------------------------------------------------------------

  /** Expected Benford ppm per leading digit: round(1e6·log10(1+1/d)).
    * Folded on the driver so both engines see the same nine integer
    * literals — no runtime log10 anywhere.
    */
  val BenfordPpm: Seq[(Int, Long)] = (1 to 9).map { d =>
    d -> math.round(1e6 * math.log10(1.0 + 1.0 / d))
  }

  /** q182: first-significant-digit (Benford) audit of `value` per
    * event type — the classic fabricated-data / instrumentation-bug
    * screen. The digit is read off the DECIMAL STRING of the
    * milli-quantized magnitude (integer → string is exact and
    * identical on both engines; no log10 on doubles, whose libm
    * rounding differs across engines). Output is the per-digit count,
    * observed ppm, expected Benford ppm, and the integer deviation —
    * all exact.
    *
    * Scale shape: one hash aggregate bounded by |event_type|×9 cells
    * with map-side combine; the scan never shuffles raw rows.
    */
  val q182BenfordAudit: QueryDef = {
    val sqlCase = BenfordPpm.map { case (d, p) => s"WHEN $d THEN $p" }
      .mkString("CASE digit ", " ", " END")
    QueryDef.sql(
      "q182_benford_audit",
      s"""WITH qv AS (SELECT event_type,
         |    CAST(round(abs(value) * 1000.0) AS BIGINT) AS q
         |  FROM (${Tables.seriesSql})),
         |d AS (SELECT event_type,
         |    CAST(substr(CAST(q AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM qv WHERE q > 0),
         |c AS (SELECT event_type, digit, count(*) AS n FROM d GROUP BY event_type, digit),
         |t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot FROM c)
         |SELECT event_type, digit, CAST(n AS BIGINT) AS n,
         |  1000000 * n // tot AS obs_ppm,
         |  CAST($sqlCase AS BIGINT) AS exp_ppm,
         |  1000000 * n // tot - $sqlCase AS dev_ppm
         |FROM t ORDER BY event_type, digit""".stripMargin) { (spark, dir) =>
      benfordDf(Tables.series(spark, dir), "value", Seq("event_type"))
        .orderBy("event_type", "digit")
    }
  }

  /** The q182 audit as a reusable stage over any numeric column. */
  def benfordDf(df: DataFrame, valueCol: String, keys: Seq[String]): DataFrame = {
    val expCol = BenfordPpm.foldLeft(lit(null).cast("long")) { case (acc, (d, p)) =>
      when(col("digit") === d, lit(p)).otherwise(acc)
    }
    val kcols = keys.map(col)
    df.select(kcols :+
        expr(s"CAST(round(abs($valueCol) * 1000.0) AS BIGINT)").as("q"): _*)
      .filter(col("q") > 0)
      .withColumn("digit", substring(col("q").cast("string"), 1, 1).cast("long"))
      .groupBy((kcols :+ col("digit")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("tot",
        sum("n").over(Window.partitionBy(keys.map(col): _*)))
      .withColumn("obs_ppm", expr("1000000L * n div tot"))
      .withColumn("exp_ppm", expCol)
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .select(kcols ++ Seq(col("digit"), col("n"), col("obs_ppm"),
        col("exp_ppm"), col("dev_ppm")): _*)
  }

  // ---------------------------------------------------------------------
  // q185: censored inter-event survival (hazard) table
  // ---------------------------------------------------------------------

  /** q185: Kaplan-Meier-style hazard table of inter-event durations
    * per event type, WITH right censoring: each (user, type)'s gap to
    * the next same-type event is a complete observation; the tail
    * from the last same-type event to the user's final event of ANY
    * type is a censored one (it counts toward the at-risk set but
    * never as an event — dropping it would bias hazards upward, the
    * classic churn-analysis mistake). Emitted per observed duration:
    * the at-risk count, event count, and `hazard_ppm = 1e6·d/n` — one
    * integer division, exact.
    *
    * Scale shape: durations milli-quantize to a VALUE-DOMAIN-bounded
    * histogram (the q108 trick), so the at-risk suffix sum is a
    * window over the small histogram, never the raw rows.
    */
  val q185HazardTable: QueryDef = QueryDef.sql(
    "q185_hazard_table",
    s"""$S, g AS (SELECT user_id, event_type, tn,
       |    lead(tn) OVER (PARTITION BY user_id, event_type ORDER BY tn, event_id) AS tnext,
       |    max(tn) OVER (PARTITION BY user_id) AS tend
       |  FROM s),
       |d AS (SELECT event_type,
       |    CAST(round((coalesce(tnext, tend) - tn) * 1000.0) AS BIGINT) AS dtm,
       |    CASE WHEN tnext IS NULL THEN 0 ELSE 1 END AS ev
       |  FROM g),
       |c AS (SELECT event_type, dtm, count(*) AS n_all,
       |    CAST(sum(ev) AS BIGINT) AS n_events
       |  FROM d GROUP BY event_type, dtm),
       |k AS (SELECT event_type, dtm, n_events,
       |    CAST(sum(n_all) OVER (PARTITION BY event_type ORDER BY dtm DESC) AS BIGINT)
       |      AS n_at_risk
       |  FROM c)
       |SELECT event_type, dtm, n_at_risk, n_events,
       |  1000000 * n_events // n_at_risk AS hazard_ppm
       |FROM k WHERE n_events > 0
       |ORDER BY event_type, dtm""".stripMargin) { (spark, dir) =>
    hazardTableDf(Tables.seriesNorm(spark, dir)).orderBy("event_type", "dtm")
  }

  /** The q185 table as a reusable stage. */
  def hazardTableDf(series: DataFrame): DataFrame = {
    val typeOw = Window.partitionBy("user_id", "event_type").orderBy("tn", "event_id")
    val userW = Window.partitionBy("user_id")
    val d = series
      .withColumn("tnext", lead(col("tn"), 1).over(typeOw))
      .withColumn("tend", max("tn").over(userW))
      .select(col("event_type"),
        expr("CAST(round((coalesce(tnext, tend) - tn) * 1000.0) AS BIGINT)").as("dtm"),
        when(col("tnext").isNull, 0L).otherwise(1L).as("ev"))
    hazardFromObs(d)
  }

  /** The histogram/at-risk half of q185 over raw observation rows
    * `(event_type, dtm, ev)` — shared with the streaming monitor,
    * whose emitted observations ARE that relation.
    */
  def hazardFromObs(d: DataFrame): DataFrame =
    d.groupBy("event_type", "dtm")
      .agg(count(lit(1)).as("n_all"), sum("ev").as("n_events"))
      .withColumn("n_at_risk",
        sum("n_all").over(Window.partitionBy("event_type").orderBy(col("dtm").desc)))
      .filter(col("n_events") > 0)
      .select(col("event_type"), col("dtm"), col("n_at_risk"), col("n_events"),
        expr("1000000L * n_events div n_at_risk").as("hazard_ppm"))

  // ---------------------------------------------------------------------
  // q192: behavioral-diversity entropy per user
  // ---------------------------------------------------------------------

  /** q192: per-user behavioral diversity — an integer-exact Shannon-
    * entropy proxy of the user's event-type mix. Per type,
    * `floor(log2(n/c))` bits via binary-string length (the q163
    * trick — no libm), weighted by the count and normalized to
    * millibits: `H = 1000·Σ c·bits div n`. Zero for single-minded
    * users, rising with mix uniformity — the engagement-breadth
    * feature behind audience segmentation.
    *
    * Scale shape: one (user, type) hash aggregate with map-side
    * combine, one per-user rollup — the same two-level shape as any
    * distinct-profile count; no windows over raw rows.
    */
  val q192UserEntropy: QueryDef = QueryDef.sql(
    "q192_user_entropy",
    s"""WITH c AS (SELECT user_id, event_type, count(*) AS c
       |  FROM events GROUP BY user_id, event_type),
       |t AS (SELECT *, CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM c)
       |SELECT user_id, count(*) AS n_types, CAST(max(n) AS BIGINT) AS n_events,
       |  CAST(1000 * sum(c * (length(printf('%b', n // c)) - 1)) // max(n) AS BIGINT)
       |    AS entropy_millibits
       |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    val c = Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    c.withColumn("n", sum("c").over(Window.partitionBy("user_id")))
      .withColumn("bits", (length(bin(expr("n div c"))) - 1).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_types"), max("n").as("n_events"),
        expr("CAST(1000 * sum(c * bits) div max(n) AS BIGINT)").as("entropy_millibits"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------------
  // q199: Welch's t-test between event-type value distributions
  // ---------------------------------------------------------------------

  /** q199: Welch's unequal-variance t statistic (and Welch-
    * Satterthwaite degrees of freedom) for every pair of event
    * types' value distributions — the A/B-significance workhorse
    * beside q172's Wilson bound (which handles proportions; this
    * handles means).
    *
    * Determinism: per type, (n, Σy, Σy²) are EXACT int64 aggregates
    * of milli-quantized values (bound: n·Σy² must stay < 2^63 —
    * holds to ~10^4 value-magnitude × 10^10 rows; a 100 TB run
    * switches the moment pass to the same value-histogram trick as
    * q108). t and df are fixed-order double expressions of those
    * exact integers, rounded once — identical bits on both engines.
    *
    * Scale shape: ONE map-side-combined aggregate to |event_type|
    * rows, then a tiny pair self-join of that 5-row relation.
    */
  val q199WelchTtest: QueryDef = QueryDef.sql(
    "q199_welch_ttest",
    s"""WITH qv AS (SELECT event_type,
       |    CAST(round(value * 1000.0) AS BIGINT) AS y
       |  FROM (${Tables.seriesSql})),
       |m AS (SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM qv GROUP BY event_type),
       |v AS (SELECT event_type, n, CAST(sy AS DOUBLE) / n AS mean_milli,
       |    (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
       |      / (CAST(n AS DOUBLE) * (n - 1)) / n AS vm
       |  FROM m WHERE n >= 2)
       |SELECT a.event_type AS type_a, b.event_type AS type_b,
       |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       |  round((a.mean_milli - b.mean_milli) / sqrt(a.vm + b.vm), 6) AS t_stat,
       |  round((a.vm + b.vm) * (a.vm + b.vm)
       |    / (a.vm * a.vm / (a.n - 1) + b.vm * b.vm / (b.n - 1)), 3) AS df
       |FROM v a JOIN v b ON a.event_type < b.event_type
       |ORDER BY type_a, type_b""".stripMargin) { (spark, dir) =>
    welchDf(Tables.series(spark, dir), "event_type", "value")
      .orderBy("type_a", "type_b")
  }

  /** The q199 test as a reusable stage over any (group, value). */
  def welchDf(df: DataFrame, group: String, valueCol: String): DataFrame = {
    val m = df
      .select(col(group).as("g"), round(col(valueCol) * 1e3).cast("long").as("y"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"), sum(expr("CAST(y AS DECIMAL(20,0)) * y")).as("syy"))
      .filter(col("n") >= 2)
      .withColumn("mean_milli", expr("CAST(sy AS DOUBLE) / n"))
      .withColumn("vm", expr(
        "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / (CAST(n AS DOUBLE) * (n - 1)) / n"))
    val a = m.select(col("g").as("type_a"), col("n").as("n_a"),
      col("mean_milli").as("ma"), col("vm").as("va"))
    val b = m.select(col("g").as("type_b"), col("n").as("n_b"),
      col("mean_milli").as("mb"), col("vm").as("vb"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        round((col("ma") - col("mb")) / sqrt(col("va") + col("vb")), 6).as("t_stat"),
        round((col("va") + col("vb")) * (col("va") + col("vb")) /
          (col("va") * col("va") / (col("n_a") - 1) +
           col("vb") * col("vb") / (col("n_b") - 1)), 3).as("df"))
  }

  // ---------------------------------------------------------------------
  // q202: Gini concentration of value magnitude per event type
  // ---------------------------------------------------------------------

  /** q202: Gini coefficient of each event type's |value|
    * distribution — the inequality/concentration audit ("is revenue
    * all in a few whale events?"). Computed ENTIRELY from the
    * milli-quantized value histogram: for the `c` copies of value
    * `v` preceded by `P` smaller samples, the classic sorted-rank
    * numerator `Σ(2i−n−1)·y₍ᵢ₎` collapses to `v·c·(2P + c − n)` —
    * so both the numerator and `n·Σ|y|` are EXACT int64 sums over
    * the bounded histogram, and `gini_ppm` is one integer division.
    *
    * Scale shape: the q108 histogram trick — the only window runs
    * over the (type, milli-value) histogram, bounded by the value
    * DOMAIN, never the raw rows (the naive formulation sorts each
    * low-cardinality type's full population on one reducer).
    */
  val q202GiniConcentration: QueryDef = QueryDef.sql(
    "q202_gini_concentration",
    s"""WITH qv AS (SELECT event_type,
       |    CAST(round(abs(value) * 1000.0) AS BIGINT) AS v
       |  FROM (${Tables.seriesSql})),
       |h AS (SELECT event_type, v, count(*) AS c FROM qv GROUP BY event_type, v),
       |p AS (SELECT *,
       |    CAST(coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pc,
       |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM h),
       |g AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |    CAST(sum(v * c * (2 * pc + c - n)) AS BIGINT) AS num,
       |    CAST(sum(v * c) AS BIGINT) AS sv
       |  FROM p GROUP BY event_type)
       |SELECT event_type, n,
       |  CAST(CASE WHEN sv = 0 THEN 0
       |    ELSE round(1000000.0 * num / (CAST(n AS DOUBLE) * sv))
       |    END AS BIGINT) AS gini_ppm
       |FROM g ORDER BY event_type""".stripMargin) { (spark, dir) =>
    giniDf(Tables.series(spark, dir), "event_type", "value").orderBy("event_type")
  }

  /** The q202 coefficient as a reusable stage over any (key, value). */
  def giniDf(df: DataFrame, key: String, valueCol: String): DataFrame = {
    val h = df
      .select(col(key),
        expr(s"CAST(round(abs($valueCol) * 1000.0) AS BIGINT)").as("v"))
      .groupBy(key, "v").agg(count(lit(1)).as("c"))
    val tw = Window.partitionBy(key)
    val pw = tw.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("pc", coalesce(sum("c").over(pw), lit(0L)))
      .withColumn("n", sum("c").over(tw))
      .groupBy(key)
      .agg(max("n").as("n"), sum(expr("v * c * (2 * pc + c - n)")).as("num"),
        sum(expr("v * c")).as("sv"))
      // the ppm scaling happens in ONE double division of the two
      // exact int64 sums (both < 2^53): `1e6 * num` as int64 already
      // overflows at sf0.1 (caught by the ANSI stress run; DuckDB
      // silently promotes to HUGEINT, Spark errors loudly)
      .select(col(key), col("n"),
        when(col("sv") === 0, lit(0L))
          .otherwise(round(lit(1000000.0) * col("num") /
            (col("n").cast("double") * col("sv"))).cast("long"))
          .as("gini_ppm"))
  }

  // ---------------------------------------------------------------------
  // q205: association rules over consecutive event pairs
  // ---------------------------------------------------------------------

  /** q205: association-rule mining over consecutive event pairs —
    * q106's raw transition counts upgraded to the market-basket
    * triple: `support = n_ij/N`, `confidence = n_ij/n_i·`,
    * `lift = n_ij·N/(n_i··n_·j)` in exact integer ppm (lift > 1e6 =
    * the pair co-occurs beyond independence; q150's text-bigram lift
    * for behavior). Margins are window sums over the
    * |event_type|²-bounded pair relation; each metric is one integer
    * division (`n·N ≤ 2^63` bound documented; a 10^12-pair run
    * pre-divides by 1000 on both sides).
    */
  val q205AssocRules: QueryDef = QueryDef.sql(
    "q205_assoc_rules",
    s"""$S, pr AS (SELECT event_type AS from_type,
       |    lead(event_type) OVER ($OW) AS to_type FROM s),
       |cn AS (SELECT from_type, to_type, count(*) AS n FROM pr
       |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
       |m AS (SELECT *, CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS nf,
       |    CAST(sum(n) OVER (PARTITION BY to_type) AS BIGINT) AS nt,
       |    CAST(sum(n) OVER () AS BIGINT) AS nn FROM cn)
       |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       |  1000000 * n // nn AS support_ppm,
       |  1000000 * n // nf AS confidence_ppm,
       |  1000000 * n * nn // (nf * nt) AS lift_ppm
       |FROM m ORDER BY from_type, to_type""".stripMargin) { (spark, dir) =>
    val ow = Window.partitionBy("user_id").orderBy("tn", "event_id")
    val cn = Tables.seriesNorm(spark, dir)
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(ow).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    cn.withColumn("nf", sum("n").over(Window.partitionBy("from_type")))
      .withColumn("nt", sum("n").over(Window.partitionBy("to_type")))
      .withColumn("nn", sum("n").over(Window.partitionBy()))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("1000000L * n div nn").as("support_ppm"),
        expr("1000000L * n div nf").as("confidence_ppm"),
        expr("1000000L * n * nn div (nf * nt)").as("lift_ppm"))
      .orderBy("from_type", "to_type")
  }

  // ---------------------------------------------------------------------
  // q206: Markov removal-effect attribution
  // ---------------------------------------------------------------------

  /** Absorption-probability iterations for q206 — fixed like
    * [[MarkovIters]] so the oracle replays them as a CTE chain.
    */
  val AttributionIters = 16

  /** q206: Markov-chain attribution with removal effects (Anderl et
    * al. 2014) — the multi-touch upgrade of q161's last-touch rule.
    * Sessions (12 h gap) become state paths `__start__ → e₁ → … `
    * truncated at the first `purchase` (the converting absorber; a
    * session ending without one absorbs to null). For the BASE chain
    * and one REMOVAL chain per channel (transitions touching the
    * channel dropped — they fall into the null absorber, the
    * standard no-renormalization form), the conversion probability
    * from `__start__` is computed by [[AttributionIters]] integer
    * value-iteration steps `v'(s) = p(s,conv) + Σ p(s,t)·v(t) div
    * 1e6` in ppm; `removal_ppm = 1e6·(base − removed) div base` is
    * the channel's share of conversions it alone enables.
    *
    * Scale shape: ONE bounded aggregate builds the ≤(K+1)² ppm
    * matrix; the 5 chains × 16 steps iterate over the collected
    * matrix on the driver (value-domain-bounded, q181's pattern).
    */
  val q206MarkovAttribution: QueryDef = {
    val channels = Seq("click", "error", "signup", "view")
    def chainCtes(tag: String, removed: Option[String]): Seq[String] = {
      val filt = removed.map(c => s"WHERE from_type <> '$c' AND to_type <> '$c'")
        .getOrElse("")
      val tr = s"tr_$tag"
      // every CTE is MATERIALIZED: DuckDB inlines single-reference
      // CTEs, and inlining a 16-step chain re-evaluates the whole
      // prefix per step (the KernelOracles lesson)
      val head =
        s"""$tr AS MATERIALIZED (SELECT * FROM tr $filt),
           |v${tag}0 AS MATERIALIZED (SELECT from_type AS s, CAST(0 AS BIGINT) AS v
           |  FROM $tr GROUP BY from_type)""".stripMargin
      val steps = (1 to AttributionIters).map { i =>
        s"""v$tag$i AS MATERIALIZED (SELECT t.from_type AS s, CAST(
           |    coalesce(sum(CASE WHEN t.to_type = 'purchase' THEN CAST(t.p_ppm AS BIGINT)
           |      ELSE t.p_ppm * v.v // 1000000 END), 0) AS BIGINT) AS v
           |  FROM $tr t LEFT JOIN v$tag${i - 1} v ON v.s = t.to_type
           |  GROUP BY t.from_type)""".stripMargin
      }
      head +: steps
    }
    val base = chainCtes("b", None)
    val rem = channels.zipWithIndex.flatMap { case (c, i) => chainCtes(s"r$i", Some(c)) }
    val remSelects = channels.zipWithIndex.map { case (c, i) =>
      s"""SELECT '$c' AS channel,
         |  (SELECT v FROM vb$AttributionIters WHERE s = '__start__') AS base_ppm,
         |  coalesce((SELECT v FROM vr$i$AttributionIters WHERE s = '__start__'), 0) AS removed_ppm""".stripMargin
    }
    QueryDef.sql(
      "q206_markov_attribution",
      s"""$S, g AS (SELECT *, CASE WHEN lag(tn) OVER ($OW) IS NULL
         |    OR tn - lag(tn) OVER ($OW) > 43200.0 THEN 1 ELSE 0 END AS brk FROM s),
         |x AS (SELECT *, CAST(sum(brk) OVER ($OW ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND CURRENT ROW) AS BIGINT) AS sid FROM g),
         |-- truncate each session at its first purchase (inclusive)
         |fp AS (SELECT user_id, sid, min(tn) AS conv_tn FROM x
         |  WHERE event_type = 'purchase' GROUP BY user_id, sid),
         |y AS (SELECT x.* FROM x LEFT JOIN fp ON fp.user_id = x.user_id AND fp.sid = x.sid
         |  WHERE fp.conv_tn IS NULL OR x.tn <= fp.conv_tn),
         |p AS (SELECT user_id, sid, event_type,
         |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id, sid ORDER BY tn, event_id)
         |      IS NULL THEN '__start__'
         |      ELSE lag(event_type) OVER (PARTITION BY user_id, sid ORDER BY tn, event_id)
         |    END AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id, sid ORDER BY tn, event_id) AS nxt
         |  FROM y),
         |ed AS (SELECT from_type, event_type AS to_type FROM p
         |  UNION ALL
         |  SELECT event_type, '__null__' FROM p
         |  WHERE nxt IS NULL AND event_type <> 'purchase'),
         |cn AS (SELECT from_type, to_type, count(*) AS n FROM ed
         |  WHERE from_type <> 'purchase' GROUP BY from_type, to_type),
         |tr AS MATERIALIZED (SELECT from_type, to_type,
         |    1000000 * n // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
         |  FROM cn),
         |${(base ++ rem).mkString(",\n")}
         |SELECT channel, CAST(base_ppm AS BIGINT) AS base_ppm,
         |  CAST(removed_ppm AS BIGINT) AS removed_ppm,
         |  CAST(CASE WHEN base_ppm = 0 THEN 0
         |    ELSE 1000000 * (base_ppm - removed_ppm) // base_ppm END AS BIGINT) AS removal_ppm
         |FROM (${remSelects.mkString("\nUNION ALL\n")})
         |ORDER BY channel""".stripMargin) { (spark, dir) =>
      markovAttributionDf(spark, Tables.seriesNorm(spark, dir), channels)
        .orderBy("channel")
    }
  }

  /** The q206 computation: bounded transition aggregate, then 5
    * chains × [[AttributionIters]] integer value-iteration steps on
    * the collected ≤(K+2)² matrix.
    */
  def markovAttributionDf(spark: SparkSession, series: DataFrame,
      channels: Seq[String]): DataFrame = {
    val ow = Window.partitionBy("user_id").orderBy("tn", "event_id")
    val lagT = lag(col("tn"), 1).over(ow)
    val x = series
      .withColumn("brk", when(lagT.isNull || col("tn") - lagT > 43200.0, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(ow.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val fp = x.filter(col("event_type") === "purchase")
      .groupBy("user_id", "sid").agg(min("tn").as("conv_tn"))
    val y = x.join(fp, Seq("user_id", "sid"), "left")
      .filter(col("conv_tn").isNull || col("tn") <= col("conv_tn"))
    val sw = Window.partitionBy("user_id", "sid").orderBy("tn", "event_id")
    val p = y.select(col("event_type"),
      coalesce(lag(col("event_type"), 1).over(sw), lit("__start__")).as("from_type"),
      lead(col("event_type"), 1).over(sw).as("nxt"))
    val ed = p.select(col("from_type"), col("event_type").as("to_type"))
      .union(p.filter(col("nxt").isNull && col("event_type") =!= "purchase")
        .select(col("event_type").as("from_type"), lit("__null__").as("to_type")))
    val tr = ed.filter(col("from_type") =!= "purchase")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("p_ppm",
        expr("1000000L * n div sum(n) over (partition by from_type)"))
      .select("from_type", "to_type", "p_ppm")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def absorb(removed: Option[String]): Long = {
      val t = removed.map(c => tr.filter(e => e._1 != c && e._2 != c)).getOrElse(tr)
      val states = t.map(_._1).distinct
      var v: Map[String, Long] = states.map(_ -> 0L).toMap
      (1 to AttributionIters).foreach { _ =>
        v = t.groupBy(_._1).map { case (s, es) =>
          s -> es.map { case (_, to, ppm) =>
            if (to == "purchase") ppm else ppm * v.getOrElse(to, 0L) / 1000000L
          }.sum
        }
      }
      v.getOrElse("__start__", 0L)
    }
    val basePpm = absorb(None)
    val rows = channels.map { c =>
      val r = absorb(Some(c))
      val removal = if (basePpm == 0) 0L else 1000000L * (basePpm - r) / basePpm
      (c, basePpm, r, removal)
    }
    import spark.implicits._
    rows.toDF("channel", "base_ppm", "removed_ppm", "removal_ppm")
  }

  // ---------------------------------------------------------------------
  // q207: SCD type-2 state history
  // ---------------------------------------------------------------------

  /** q207: slowly-changing-dimension (type 2) history of each user's
    * event-type "state": consecutive same-type runs collapse into
    * versioned validity intervals `[valid_from, valid_to)` with the
    * open current version flagged — the warehouse-standard
    * point-in-time dimension built straight from the event stream
    * (the gaps-and-islands change detector, q31's sibling, applied
    * to dimension maintenance instead of spike runs).
    *
    * Determinism: versions are integer prefix sums of change flags;
    * interval bounds are pass-through `tn` doubles (exact µs-derived
    * values, never re-aggregated).
    *
    * Scale shape: one series shuffle; the second window runs over
    * the RUN relation (one row per state change), not the raw rows.
    */
  val q207Scd2History: QueryDef = QueryDef.sql(
    "q207_scd2_history",
    s"""$S, g AS (SELECT *, CASE WHEN lag(event_type) OVER ($OW) IS NULL
       |    OR lag(event_type) OVER ($OW) <> event_type THEN 1 ELSE 0 END AS chg FROM s),
       |v AS (SELECT *, CAST(sum(chg) OVER ($OW ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW) AS BIGINT) AS version FROM g),
       |r AS (SELECT user_id, version, event_type AS state,
       |    min(tn) AS valid_from, count(*) AS n_events
       |  FROM v GROUP BY user_id, version, event_type)
       |SELECT user_id, version, state, valid_from,
       |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
       |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current,
       |  CAST(n_events AS BIGINT) AS n_events
       |FROM r ORDER BY user_id, version""".stripMargin) { (spark, dir) =>
    val ow = Window.partitionBy("user_id").orderBy("tn", "event_id")
    val lagType = lag(col("event_type"), 1).over(ow)
    val r = Tables.seriesNorm(spark, dir)
      .withColumn("chg",
        when(lagType.isNull || lagType =!= col("event_type"), 1).otherwise(0))
      .withColumn("version",
        sum("chg").over(ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"), col("event_type").as("state"))
      .agg(min("tn").as("valid_from"), count(lit(1)).as("n_events"))
    val vw = Window.partitionBy("user_id").orderBy("version")
    r.select(col("user_id"), col("version"), col("state"), col("valid_from"),
        lead(col("valid_from"), 1).over(vw).as("valid_to"),
        lead(col("valid_from"), 1).over(vw).isNull.as("is_current"),
        col("n_events"))
      .orderBy("user_id", "version")
  }

  // ---------------------------------------------------------------------
  // q213: hash-deterministic resampling confidence interval
  // ---------------------------------------------------------------------

  /** Half-sample replicates for q213. */
  val BootstrapReps = 32

  /** q213: a resampling confidence interval for each event type's
    * mean value WITHOUT randomness: 32 half-sample replicates whose
    * membership is decided by the md5 prefix of (event_id, replicate)
    * — the deterministic stand-in for bootstrap RNG, so the interval
    * is reproducible bit-for-bit on any engine and any partitioning
    * (the same derandomization-by-hash move as the q75 sample and
    * q141's feature hashing). Each replicate's mean is a truncating
    * integer milli-mean; the p05/p50/p95 of the 32 replicate means
    * use the engine-shared exact interpolation (q101/q108 precedent).
    *
    * Scale shape: a 32-way constant explode feeding ONE map-side-
    * combined (type, rep) aggregate, then a |types|×32-row rollup —
    * no windows over raw rows.
    */
  val q213BootstrapCi: QueryDef = QueryDef.sql(
    "q213_bootstrap_ci",
    s"""WITH qv AS (SELECT event_type, event_id,
       |    CAST(round(value * 1000.0) AS BIGINT) AS q
       |  FROM (${Tables.seriesSql})),
       |x AS (SELECT event_type, q, b FROM qv,
       |  unnest(generate_series(0, ${BootstrapReps - 1})) AS t(b)
       |  WHERE ('0x' || substr(md5(CAST(event_id * $BootstrapReps + b AS VARCHAR)), 1, 8))::BIGINT % 2 = 0),
       |m AS (SELECT event_type, b,
       |    CAST(sum(q) AS BIGINT) // count(*) AS mean_milli
       |  FROM x GROUP BY event_type, b)
       |SELECT event_type, count(*) AS n_reps,
       |  round(quantile_cont(mean_milli, 0.05) / 1000.0, 6) AS lo,
       |  round(quantile_cont(mean_milli, 0.5) / 1000.0, 6) AS mid,
       |  round(quantile_cont(mean_milli, 0.95) / 1000.0, 6) AS hi
       |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.GraftExpressionBridge
    def md5p32(c: org.apache.spark.sql.Column) =
      GraftExpressionBridge.column(
        graft.functions.Md5Prefix32(GraftExpressionBridge.expression(c)))
    val reps = array((0 until BootstrapReps).map(b => lit(b.toLong)): _*)
    Tables.series(spark, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 1e3).cast("long").as("q"))
      .select(col("event_type"), col("event_id"), col("q"), explode(reps).as("b"))
      .filter(md5p32(
        (col("event_id") * BootstrapReps + col("b")).cast("string")) % 2 === 0)
      .groupBy("event_type", "b")
      .agg(expr("CAST(sum(q) AS BIGINT) div count(1)").as("mean_milli"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_reps"),
        round(percentile(col("mean_milli"), lit(0.05)) / 1000.0, 6).as("lo"),
        round(percentile(col("mean_milli"), lit(0.5)) / 1000.0, 6).as("mid"),
        round(percentile(col("mean_milli"), lit(0.95)) / 1000.0, 6).as("hi"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------------
  // q214: CUPED pre-period variance reduction
  // ---------------------------------------------------------------------

  /** q214: CUPED (Deng et al., WSDM'13) — how much experiment
    * variance a pre-period covariate removes. Each user's timeline
    * splits at its midpoint; x = the truncating integer milli-mean
    * of the pre half, y = of the post half; θ = the OLS slope of y
    * on x over users, and the achievable variance reduction is
    * exactly the fit's R² (`var(y−θx) = var(y)·(1−ρ²)`). Users
    * missing either half are excluded on both engines.
    *
    * Scale shape: two window passes per user (midpoint + means) on
    * one series shuffle, then q191's exact-moment one-row fit.
    */
  val q214Cuped: QueryDef = QueryDef.sql(
    "q214_cuped",
    s"""$S, u AS (SELECT user_id, tn,
       |    CAST(round(value * 1000.0) AS BIGINT) AS q,
       |    max(tn) OVER (PARTITION BY user_id) AS tmax FROM s),
       |xy AS (SELECT user_id,
       |    CAST(sum(CASE WHEN tn <= tmax / 2 THEN q END) AS BIGINT)
       |      // count(CASE WHEN tn <= tmax / 2 THEN 1 END) AS x,
       |    CAST(sum(CASE WHEN tn > tmax / 2 THEN q END) AS BIGINT)
       |      // count(CASE WHEN tn > tmax / 2 THEN 1 END) AS y
       |  FROM u GROUP BY user_id
       |  HAVING count(CASE WHEN tn <= tmax / 2 THEN 1 END) > 0
       |    AND count(CASE WHEN tn > tmax / 2 THEN 1 END) > 0),
       |m AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy, sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy, sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM xy),
       |e AS (SELECT n, sx, sy,
       |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS a,
       |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS b,
       |    CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS c FROM m)
       |SELECT CAST(n AS BIGINT) AS n_users,
       |  round(CASE WHEN b <> 0 THEN a / b END, 6) AS theta,
       |  round(CASE WHEN b <> 0 AND c <> 0 THEN a * a / (b * c) END, 6)
       |    AS var_reduction
       |FROM e""".stripMargin) { (spark, dir) =>
    val uw = Window.partitionBy("user_id")
    val xy = Tables.seriesNorm(spark, dir)
      .withColumn("q", round(col("value") * 1e3).cast("long"))
      .withColumn("tmax", max("tn").over(uw))
      .groupBy("user_id")
      .agg(
        expr("CAST(sum(CASE WHEN tn <= tmax / 2 THEN q END) AS BIGINT)" +
          " div count(CASE WHEN tn <= tmax / 2 THEN 1 END)").as("x"),
        expr("CAST(sum(CASE WHEN tn > tmax / 2 THEN q END) AS BIGINT)" +
          " div count(CASE WHEN tn > tmax / 2 THEN 1 END)").as("y"),
        expr("count(CASE WHEN tn <= tmax / 2 THEN 1 END)").as("npre"),
        expr("count(CASE WHEN tn > tmax / 2 THEN 1 END)").as("npost"))
      .filter(col("npre") > 0 && col("npost") > 0)
      .withColumn("k", lit("all"))
    val fit = graft.operators.AuditOps.olsFitDf(xy, "k", "x", "y")
    fit.select(col("n").as("n_users"), col("slope").as("theta"),
      col("r2").as("var_reduction"))
  }

  // ---------------------------------------------------------------------
  // q215: exact trimmed mean per event type
  // ---------------------------------------------------------------------

  /** q215: 5%-trimmed mean of each type's value — the robust center
    * the plain mean isn't, computed EXACTLY from the milli-value
    * histogram: with k = n·5 div 100 samples trimmed per tail, a
    * histogram row (v, count c, prefix p) keeps
    * `max(0, min(p+c, n−k) − max(p, k))` samples — pure integer
    * clamps, so the trimmed sum is exact and the mean is one double
    * division (q202's scale argument: windows over the bounded
    * histogram only).
    */
  val q215TrimmedMean: QueryDef = QueryDef.sql(
    "q215_trimmed_mean",
    s"""WITH qv AS (SELECT event_type,
       |    CAST(round(value * 1000.0) AS BIGINT) AS v
       |  FROM (${Tables.seriesSql})),
       |h AS (SELECT event_type, v, count(*) AS c FROM qv GROUP BY event_type, v),
       |p AS (SELECT *,
       |    CAST(coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pc,
       |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM h),
       |t AS (SELECT event_type, n, n * 5 // 100 AS k,
       |    CAST(sum(v * greatest(least(pc + c, n - n * 5 // 100)
       |      - greatest(pc, n * 5 // 100), 0)) AS BIGINT) AS ts
       |  FROM p GROUP BY event_type, n)
       |SELECT event_type, n, CAST(k AS BIGINT) AS k_trimmed,
       |  round(CAST(ts AS DOUBLE) / (n - 2 * k) / 1000.0, 6) AS trimmed_mean
       |FROM t ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val h = Tables.series(spark, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 1000.0) AS BIGINT)").as("v"))
      .groupBy("event_type", "v").agg(count(lit(1)).as("c"))
    val tw = Window.partitionBy("event_type")
    val pw = tw.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("pc", coalesce(sum("c").over(pw), lit(0L)))
      .withColumn("n", sum("c").over(tw))
      .groupBy(col("event_type"), col("n"))
      .agg(sum(expr("v * greatest(least(pc + c, n - n * 5 div 100)" +
        " - greatest(pc, n * 5 div 100), 0L)")).as("ts"))
      .withColumn("k_trimmed", expr("n * 5 div 100"))
      .select(col("event_type"), col("n"), col("k_trimmed"),
        round(col("ts").cast("double") / (col("n") - col("k_trimmed") * 2) / 1000.0, 6)
          .as("trimmed_mean"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------------
  // q221: event-mix drift week over week
  // ---------------------------------------------------------------------

  /** q221: event-type share drift — per (type, calendar week) the
    * event count, the week's mix share in ppm, and the share delta
    * vs the previous week (the ingest-mix alarm: a type whose share
    * jumps week-over-week usually means an instrumentation change,
    * not user behavior). Shares are integer divisions of exact
    * counts; the lag runs over the |types|×weeks grid, never raw
    * rows.
    */
  val q221ShareDrift: QueryDef = QueryDef.sql(
    "q221_share_drift",
    s"""WITH w AS (SELECT event_type,
       |    CAST(floor(t / 604800.0) AS BIGINT) AS week
       |  FROM (${Tables.seriesSql})),
       |c AS (SELECT event_type, week, count(*) AS n FROM w GROUP BY event_type, week),
       |sh AS (SELECT *, 1000000 * n // CAST(sum(n) OVER (PARTITION BY week) AS BIGINT)
       |    AS share_ppm FROM c)
       |SELECT event_type, week, CAST(n AS BIGINT) AS n, share_ppm,
       |  share_ppm - lag(share_ppm) OVER (PARTITION BY event_type ORDER BY week)
       |    AS drift_ppm
       |FROM sh ORDER BY event_type, week""".stripMargin) { (spark, dir) =>
    val c = Tables.series(spark, dir)
      .select(col("event_type"), expr("CAST(floor(t / 604800.0) AS BIGINT)").as("week"))
      .groupBy("event_type", "week").agg(count(lit(1)).as("n"))
    c.withColumn("share_ppm",
        expr("1000000L * n div sum(n) over (partition by week)"))
      .withColumn("drift_ppm", col("share_ppm") -
        lag(col("share_ppm"), 1).over(Window.partitionBy("event_type").orderBy("week")))
      .select("event_type", "week", "n", "share_ppm", "drift_ppm")
      .orderBy("event_type", "week")
  }

  // ---------------------------------------------------------------------
  // q223: frequent 3-event sequences
  // ---------------------------------------------------------------------

  /** q223: the top-20 most frequent 3-event SEQUENCES across users —
    * sequence mining one step beyond q205's pairwise rules (the
    * motif view: "view→click→purchase" vs "error→error→error").
    * Counts are a plain hash aggregate over two leads on the series
    * shuffle; the cut is a total-ordered TakeOrdered (count desc,
    * then the lexicographic triple) — never a global sort.
    */
  val q223TrigramPaths: QueryDef = QueryDef.sql(
    "q223_trigram_paths",
    s"""$S, p AS (SELECT event_type AS t1,
       |    lead(event_type, 1) OVER ($OW) AS t2,
       |    lead(event_type, 2) OVER ($OW) AS t3 FROM s)
       |SELECT t1, t2, t3, count(*) AS n
       |FROM p WHERE t3 IS NOT NULL
       |GROUP BY t1, t2, t3
       |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin) { (spark, dir) =>
    val ow = Window.partitionBy("user_id").orderBy("tn", "event_id")
    Tables.seriesNorm(spark, dir)
      .select(col("event_type").as("t1"),
        lead(col("event_type"), 1).over(ow).as("t2"),
        lead(col("event_type"), 2).over(ow).as("t3"))
      .filter(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  // ---------------------------------------------------------------------
  // q233: k-anonymity census over behavioral quasi-identifiers
  // ---------------------------------------------------------------------

  /** q233: privacy-risk audit of the event log under the classic
    * k-anonymity model (Sweeney, IJUFKS 2002): every user is reduced
    * to a coarse behavioral quasi-identifier — (modal event type,
    * floor-log2 bucket of total events, floor-log2 bucket of active
    * days) — and users sharing a tuple form an equivalence class. A
    * user in a class of size k is re-identifiable to 1-in-k; classes
    * with k below the disclosure threshold (5) are flagged. The
    * output is the class-SIZE census: how many classes and users sit
    * at each k — the standard shape of a release-risk report.
    *
    * Determinism: the modal type breaks ties by (count desc, type
    * asc) — a total order; the buckets are integer bit-lengths
    * (q95's log-free policy); everything downstream is counting.
    *
    * Scale shape: per-(user, type) counts and per-user totals are
    * map-side-combined hash aggregates keyed by user (one shuffle
    * each on the same key); the modal pick is a row_number window
    * that WindowGroupLimit prunes map-side (the q107 pattern); the
    * class aggregate is bounded by |types| × log² buckets — a few
    * thousand rows regardless of corpus size — and the final census
    * by the distinct class sizes. No census row count grows with the
    * 100 TB input.
    */
  val q233KAnonymity: QueryDef = QueryDef.sql(
    "q233_k_anonymity",
    """WITH ut AS (SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY user_id, event_type),
      |top AS (SELECT user_id, event_type AS top_type FROM (
      |    SELECT user_id, event_type,
      |      row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) AS rn
      |    FROM ut) WHERE rn = 1),
      |u AS (SELECT user_id, count(*) AS n,
      |    count(DISTINCT epoch_us(ts) // 1000000 // 86400) AS d
      |  FROM events GROUP BY user_id),
      |prof AS (SELECT u.user_id, top_type,
      |    length(printf('%b', n)) - 1 AS n_bucket,
      |    length(printf('%b', d)) - 1 AS d_bucket
      |  FROM u JOIN top USING (user_id)),
      |cls AS (SELECT top_type, n_bucket, d_bucket, count(*) AS k_size
      |  FROM prof GROUP BY top_type, n_bucket, d_bucket)
      |SELECT k_size, count(*) AS n_classes,
      |  CAST(k_size * count(*) AS BIGINT) AS n_users,
      |  CAST(k_size < 5 AS INTEGER) AS at_risk
      |FROM cls GROUP BY k_size ORDER BY k_size""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val ut = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val top = ut
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("c").desc, col("event_type"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"))
    val u = ev.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      countDistinct(expr("ts div 1000000000 div 86400")).as("d"))
    val prof = u.join(top, "user_id").select(
      col("top_type"),
      (length(bin(col("n"))) - 1).as("n_bucket"),
      (length(bin(col("d"))) - 1).as("d_bucket"))
    prof.groupBy("top_type", "n_bucket", "d_bucket")
      .agg(count(lit(1)).as("k_size"))
      .groupBy("k_size")
      .agg(count(lit(1)).as("n_classes"))
      .select(col("k_size"), col("n_classes"),
        (col("k_size") * col("n_classes")).as("n_users"),
        when(col("k_size") < 5, 1).otherwise(0).as("at_risk"))
      .orderBy("k_size")
  }

  val all: Seq[QueryDef] = Seq(q181MarkovStationary, q182BenfordAudit,
    q185HazardTable, q192UserEntropy, q199WelchTtest, q202GiniConcentration,
    q205AssocRules, q206MarkovAttribution, q207Scd2History, q213BootstrapCi,
    q214Cuped, q215TrimmedMean, q221ShareDrift, q223TrigramPaths,
    q233KAnonymity)
}
