package graft.operators

import graft.QueryDef
import graft.engine.Recipes
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** End-to-end recipe replay (§2.10): a reference-shaped JSON recipe
  * parsed, compiled to one lazy transform chain, and folded over ALL
  * series in a single job — derived expression → full-series moving
  * average → selection-scoped z-score → mark-bad. The oracle SQL
  * replays the identical chain in DuckDB.
  */
object RecipeQueries {

  private val s = SeriesOps.Series(Seq("user_id"), "tn", Seq("event_id"))

  private val SelStart = 86400.0
  private val SelEnd = 864000.0
  private val BadStart = 1728000.0
  private val BadEnd = 2592000.0

  private val recipeJson =
    s"""[{"type":"derived","name":"v2","expr":"value * 2.0 + 1.0"},
       | {"type":"filter","filter":"moving_average","params":{"window":5},"channels":["v2"]},
       | {"type":"filter","filter":"zscore","params":{},"channels":["v2"],"start":$SelStart,"end":$SelEnd},
       | {"type":"mark_bad","start":$BadStart,"end":$BadEnd}]""".stripMargin

  val q39RecipeReplay: QueryDef = QueryDef.sql(
    "q39_recipe_replay",
    s"""WITH s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |  FROM (${Tables.seriesSql})),
       |d AS (SELECT *, value * 2.0 + 1.0 AS v2 FROM s),
       |m AS (SELECT *, avg(v2) OVER (PARTITION BY user_id
       |    ORDER BY tn, event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS v2m FROM d),
       |f AS (SELECT *, tn BETWEEN $SelStart AND $SelEnd AS insel FROM m),
       |z AS (SELECT *, CASE WHEN insel THEN
       |    (v2m - avg(v2m) OVER (PARTITION BY user_id, insel)) /
       |    (CASE WHEN coalesce(stddev_pop(v2m) OVER (PARTITION BY user_id, insel), 0) = 0
       |          THEN 1.0 ELSE stddev_pop(v2m) OVER (PARTITION BY user_id, insel) END)
       |  ELSE v2m END AS v2z FROM f)
       |SELECT user_id, event_id, tn, round(v2z, 6) AS v2,
       |  tn BETWEEN $BadStart AND $BadEnd AS is_bad_segment
       |FROM z ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    val replay = Recipes.compile(spark, s, Recipes.fromJson(recipeJson))
    replay(Tables.seriesNorm(spark, dir))
      .select(col("user_id"), col("event_id"), col("tn"),
        round(col("v2"), 6).as("v2"), col("is_bad_segment"))
      .orderBy("user_id", "event_id")
  }

  /** S4 sample-rate inference (`round(1/median(positive Δt), 2)`,
    * data_model.py:116-126) per series — exact interpolating median.
    */
  val q49SampleRate: QueryDef = QueryDef.sql(
    "q49_sample_rate",
    s"""WITH s AS (SELECT *, t - min(t) OVER (PARTITION BY user_id) AS tn
       |  FROM (${Tables.seriesSql})),
       |d AS (SELECT user_id, tn - lag(tn) OVER (PARTITION BY user_id
       |    ORDER BY tn, event_id) AS dt FROM s)
       |SELECT user_id, round(1.0 / quantile_cont(dt, 0.5), 6) AS fs_hz
       |FROM d WHERE dt > 0 GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    Tables.seriesNorm(spark, dir)
      .withColumn("dt", col("tn") - lag(col("tn"), 1).over(s.ordered))
      .filter(col("dt") > 0)
      .groupBy("user_id")
      .agg(round(lit(1.0) / percentile(col("dt"), lit(0.5)), 6).as("fs_hz"))
      .orderBy("user_id")
  }

  /** S1/S5 through the DataSource V2 connector end-to-end: a
    * deterministic trial-shaped slice of lineitem is written with the
    * connector's CSV sink (`TrialDataWriter`, rename-on-commit), read
    * back through the connector's scan — column pruning and predicate
    * pushdown both engage: the `l_quantity > 25` filter is evaluated
    * on raw cells before row materialization
    * ([[graft.sources.v2.TrialSource]]) — and aggregated with the
    * integer-cents trick so partial-agg order can't flip rounding.
    * The oracle computes the same aggregate straight from parquet, so
    * a hash match certifies the sink+scan round-trip bit-exactly
    * (Double.toString / parseDouble are shortest-roundtrip inverses).
    */
  val q149V2TrialScan: QueryDef = QueryDef.sql(
    "q149_v2_trial_scan",
    """SELECT l_returnflag,
      |  round(CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_qty,
      |  round(CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_price,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_orderkey % 32 = 0 AND l_quantity > 25.0
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val fmt = "graft.sources.v2.TrialSource"
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_v2_scan_" + Integer.toHexString(dir.hashCode))
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 32 === 0)
      .select(col("l_quantity").cast("double").as("l_quantity"),
        col("l_extendedprice").cast("double").as("l_extendedprice"),
        col("l_returnflag"))
      .write.format(fmt).mode("overwrite").save(tmp.toString)
    spark.read.format(fmt).load(tmp.toString)
      .filter(col("l_quantity") > 25.0) // pushed into the raw-cell scan
      .groupBy("l_returnflag")
      .agg(
        round(sum(round(col("l_quantity") * lit(100.0)).cast("bigint")).cast("double")
          / lit(100.0), 2).as("sum_qty"),
        round(sum(round(col("l_extendedprice") * lit(100.0)).cast("bigint")).cast("double")
          / lit(100.0), 2).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val all: Seq[QueryDef] = Seq(q39RecipeReplay, q49SampleRate, q149V2TrialScan)
}
