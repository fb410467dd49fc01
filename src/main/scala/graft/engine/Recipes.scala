package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.operators.SeriesOps
import graft.operators.SeriesOps.Series
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Recipes — the reference's serialized operation pipelines
  * (/root/reference/main.py:730-794) and JSON plugins
  * (/root/reference/main.py:796-820, README.md:239-251) — re-expressed
  * as a small ADT compiled to ONE lazy DataFrame transform chain.
  *
  * The reference replays a recipe trial-by-trial in a Python loop;
  * here the fold produces a single Catalyst plan over a
  * series-partitioned DataFrame, so one job replays the recipe over
  * every series at once — the core capability upgrade at 100 TB.
  * `derived` expressions go through Spark SQL `expr(...)`, making
  * Catalyst the expression compiler (the reference uses `pd.eval`,
  * main.py:815).
  */
object Recipes {

  sealed trait Op
  object Op {
    /** Named filter over channels, optional time selection;
      * `strParams` carries string-valued params (interpolate method).
      */
    final case class Filter(filter: String, params: Map[String, Double],
        channels: Seq[String], selection: Option[(Double, Double)],
        strParams: Map[String, String] = Map.empty) extends Op
    /** Derived column from a SQL expression (the reference's entire
      * user-facing expression language).
      */
    final case class Derived(name: String, expr: String) extends Op
    /** Hard-delete a time interval and collapse the axis (R2). */
    final case class DeleteSegment(start: Double, end: Double) extends Op
    /** Flag a time interval as bad, duration preserved (R3). */
    final case class MarkBad(start: Double, end: Double) extends Op
  }

  /** Execute one op. */
  def exec(spark: SparkSession, s: Series)(df: DataFrame, op: Op): DataFrame = op match {
    case Op.Filter(name, params, channels, sel, strParams) =>
      FilterEngine.apply(spark, df, s, channels,
        FilterSpec.fromParams(name, params, strParams), sel)
    case Op.Derived(name, e) => df.withColumn(name, expr(e))
    case Op.DeleteSegment(a, b) => SeriesOps.deleteCollapse(df, s, a, b)
    case Op.MarkBad(a, b) => SeriesOps.markBad(df, s, a, b)
  }

  /** Compile a recipe to a single lazy transform (fold). */
  def compile(spark: SparkSession, s: Series, ops: Seq[Op]): DataFrame => DataFrame =
    df => ops.foldLeft(df)(exec(spark, s))

  // ------------------------- JSON ⇄ ADT -------------------------

  private val mapper = new ObjectMapper()

  /** Parse the reference-shaped recipe JSON:
    * `[{"type":"filter","filter":…,"params":{…},"channels":[…],
    *    "start":…,"end":…}, {"type":"derived","name":…,"expr":…},
    *   {"type":"delete",…}, {"type":"mark_bad",…}]`
    */
  def fromJson(json: String): Seq[Op] =
    mapper.readTree(json).elements().asScala.map(parseOp).toSeq

  private def parseOp(n: JsonNode): Op = n.get("type").asText() match {
    case "filter" =>
      val all = Option(n.get("params")).map(_.properties().asScala.toSeq)
        .getOrElse(Nil)
      val params = all.collect {
        case e if e.getValue.isNumber => e.getKey -> e.getValue.asDouble()
      }.toMap
      val strParams = all.collect {
        case e if e.getValue.isTextual => e.getKey -> e.getValue.asText()
      }.toMap
      val channels = Option(n.get("channels"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      val sel = (Option(n.get("start")), Option(n.get("end"))) match {
        case (Some(a), Some(b)) => Some((a.asDouble(), b.asDouble()))
        case _ => None
      }
      Op.Filter(n.get("filter").asText(), params, channels, sel, strParams)
    case "derived" => Op.Derived(n.get("name").asText(), n.get("expr").asText())
    case "delete" => Op.DeleteSegment(n.get("start").asDouble(), n.get("end").asDouble())
    case "mark_bad" => Op.MarkBad(n.get("start").asDouble(), n.get("end").asDouble())
    case other => throw new IllegalArgumentException(s"unknown op type: $other")
  }

  /** Serialize a recipe back to the JSON wire shape. */
  def toJson(ops: Seq[Op]): String = {
    val arr = mapper.createArrayNode()
    ops.foreach {
      case Op.Filter(f, params, channels, sel, strParams) =>
        val o = obj(arr, "filter"); o.put("filter", f)
        val p = o.putObject("params")
        params.foreach { case (k, v) => p.put(k, v) }
        strParams.foreach { case (k, v) => p.put(k, v) }
        val c = o.putArray("channels"); channels.foreach(c.add)
        sel.foreach { case (a, b) => o.put("start", a); o.put("end", b) }
      case Op.Derived(name, e) =>
        val o = obj(arr, "derived"); o.put("name", name); o.put("expr", e)
      case Op.DeleteSegment(a, b) =>
        val o = obj(arr, "delete"); o.put("start", a); o.put("end", b)
      case Op.MarkBad(a, b) =>
        val o = obj(arr, "mark_bad"); o.put("start", a); o.put("end", b)
    }
    mapper.writeValueAsString(arr)
  }

  private def obj(arr: ArrayNode, tpe: String): ObjectNode = {
    val o = arr.addObject(); o.put("type", tpe); o
  }
}
