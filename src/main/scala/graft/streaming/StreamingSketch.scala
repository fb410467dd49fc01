package graft.streaming

import graft.QueryDef
import graft.functions.{KmvSketchAgg, TextHash}
import graft.operators.Sketches.SketchK
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count sketching: the q84 KMV sketch carried
  * across micro-batches as keyed state (`readStream` →
  * `flatMapGroupsWithState`), so an unbounded token stream yields a
  * live per-source distinct estimate from a few hundred bytes of
  * state per key.
  *
  * This works because the KMV state is a pure SET of global k-minima:
  * fold order, batch boundaries, and partitioning cannot change it
  * ([[KmvSketchAgg]]'s reduce/merge are set inserts) — so the
  * streaming result is BIT-IDENTICAL to the batch q84 sketch columns
  * and shares q84's sequential-SQL oracle. The exact-count column is
  * deliberately absent: carrying it would need the full value set per
  * key (unbounded state), which is precisely what the sketch exists
  * to avoid on a 100 TB stream.
  */
object StreamingSketch {

  final case class KmvRow(source: String, kth_hash: Long, est_distinct: Double)
  final case class KmvState(ks: Array[Long])

  /** HALF_UP like Spark's `round(x, 4)` — same policy as the other
    * streaming twins, so the hash compare matches the oracle.
    */
  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fold this batch's hashes into the carried k-minima and re-emit
    * the key's current sketch row (upsert-sink contract: latest row
    * per source wins, like the other streaming queries).
    */
  private def update(source: String, rows: Iterator[Row],
      state: GroupState[KmvState]): Iterator[KmvRow] = {
    val agg = new KmvSketchAgg(SketchK)
    var ks = state.getOption.map(_.ks).getOrElse(Array.emptyLongArray)
    rows.foreach(r => ks = agg.reduce(ks, r.getLong(1)))
    if (ks.isEmpty) return Iterator.empty
    state.update(KmvState(ks))
    val est =
      if (ks.length < SketchK) ks.length.toDouble
      else round4((SketchK - 1).toDouble * 4294967296.0 / ks.last)
    Iterator.single(KmvRow(source, ks.last, est))
  }

  /** The per-source KMV stream over a directory of document-parquet
    * files (one micro-batch per file with `oneFilePerTrigger`, how
    * the spec exercises cross-batch state).
    */
  def kmvStream(spark: SparkSession, dir: String,
      glob: String = "documents.parquet",
      oneFilePerTrigger: Boolean = false): org.apache.spark.sql.Dataset[KmvRow] = {
    import spark.implicits._
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    val withTrigger =
      if (oneFilePerTrigger) reader.option("maxFilesPerTrigger", 1) else reader
    graft.sources.Tables.normalizeEventTs(withTrigger.parquet(dir))
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .select(col("source"), TextHash.base32(col("token")).as("h"))
      .groupByKey(_.getString(0))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  def run(spark: SparkSession, dir: String,
      sinkName: String = "stream_kmv"): DataFrame = {
    val q = kmvStream(spark, dir).writeStream
      .format("memory").queryName(sinkName).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    spark.table(sinkName)
  }

  /** Declared streaming query — the oracle is q84's sequential SQL
    * restricted to the sketch columns (streaming state cannot carry
    * the exact count; see the object doc).
    */
  val q134StreamKmv: QueryDef = QueryDef.sql(
    "q134_stream_kmv",
    s"""WITH t AS (SELECT DISTINCT source, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM t)
       |SELECT source,
       |  max(CASE WHEN rn <= $SketchK THEN h END) AS kth_hash,
       |  round(CASE WHEN count(CASE WHEN rn <= $SketchK THEN 1 END) < $SketchK
       |    THEN CAST(count(CASE WHEN rn <= $SketchK THEN 1 END) AS DOUBLE)
       |    ELSE ${SketchK - 1}.0 * 4294967296.0 / max(CASE WHEN rn <= $SketchK THEN h END)
       |    END, 4) AS est_distinct
       |FROM r GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    run(spark, dir).orderBy("source")
  }

  val all: Seq[QueryDef] = Seq(q134StreamKmv)
}
