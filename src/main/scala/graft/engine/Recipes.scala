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

  /** Execute one op. Reference recipes carry Butterworth cutoffs in
    * Hz; those normalize against the PER-SERIES inferred sample rate
    * at execution ([[FilterSpec.fromParams]] → the Hz kernel
    * variants), faithful over mixed-rate multi-trial frames.
    */
  def exec(spark: SparkSession, s: Series)(df: DataFrame, op: Op): DataFrame = op match {
    case Op.Filter(name, params, channels, sel, strParams) =>
      FilterEngine.apply(spark, df, s, channels,
        FilterSpec.fromParams(name, params, strParams), sel)
    case Op.Derived(name, e) => df.withColumn(name, expr(Plugins.translateExpr(e)))
    case Op.DeleteSegment(a, b) => SeriesOps.deleteCollapse(df, s, a, b)
    case Op.MarkBad(a, b) => SeriesOps.markBad(df, s, a, b)
  }

  /** Compile a recipe to a single lazy transform (fold). */
  def compile(spark: SparkSession, s: Series, ops: Seq[Op]): DataFrame => DataFrame =
    df => ops.foldLeft(df)(exec(spark, s))

  // ------------------------- JSON ⇄ ADT -------------------------

  private val mapper = new ObjectMapper()

  /** Parse recipe JSON. Two wire shapes are accepted:
    *  - graft ADT form: `[{"type":"filter","filter":…,"params":{…},
    *    "channels":[…],"start":…,"end":…}, {"type":"derived",…},
    *    {"type":"delete",…}, {"type":"mark_bad",…}]`
    *  - the reference's saved-recipe form
    *    (/root/reference/main.py:730-742): `{"operations":
    *    [{"description":"filter","params":{"channels":[…],
    *    "filter_type":…, <numeric params>, "apply_selection":…},
    *    "start":…,"end":…}]}`.
    */
  def fromJson(json: String): Seq[Op] = {
    val root = mapper.readTree(json)
    if (root.isObject && root.has("operations"))
      root.get("operations").elements().asScala.map(parseReferenceOp).toSeq
    else root.elements().asScala.map(parseOp).toSeq
  }

  /** One entry of the reference's recipe `operations` list. */
  private def parseReferenceOp(n: JsonNode): Op = {
    val desc = n.get("description").asText()
    val p = Option(n.get("params"))
    def pd(f: String): Option[Double] =
      p.flatMap(o => Option(o.get(f))).filter(_.isNumber).map(_.asDouble())
    desc match {
      case "filter" =>
        val raw = p.map(_.properties().asScala.collect {
          case e if e.getValue.isNumber => e.getKey -> e.getValue.asDouble()
        }.toMap).getOrElse(Map.empty)
        val ft = p.flatMap(o => Option(o.get("filter_type"))).map(_.asText()).getOrElse("")
        // this wire shape IS the reference dialect, so a bare
        // Butterworth gets the reference defaults (cutoff 6 Hz /
        // 0.5-10 Hz band, filter_engine.py:51-57), not graft's
        // normalized-Wn defaults
        val params = ft match {
          case "butter_lowpass"
              if !raw.contains("cutoff") && !raw.contains("cutoff_wn") =>
            raw + ("cutoff" -> 6.0)
          case "butter_bandpass"
              if !Seq("low_cut", "high_cut", "low_wn", "high_wn").exists(raw.contains) =>
            raw + ("low_cut" -> 0.5, "high_cut" -> 10.0)
          case _ => raw
        }
        val strParams = p.map(_.properties().asScala.collect {
          case e if e.getValue.isTextual && e.getKey != "filter_type" &&
            e.getKey != "preset" => e.getKey -> e.getValue.asText()
        }.toMap).getOrElse(Map.empty)
        val channels = p.flatMap(o => Option(o.get("channels")))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
        val applySel = p.flatMap(o => Option(o.get("apply_selection")))
          .exists(_.asBoolean(false))
        val sel =
          if (applySel)
            for (a <- Option(n.get("start")); b <- Option(n.get("end")))
              yield (a.asDouble(), b.asDouble())
          else None
        Op.Filter(p.flatMap(o => Option(o.get("filter_type"))).map(_.asText())
          .getOrElse(throw new IllegalArgumentException("filter_type missing")),
          params, channels, sel, strParams)
      case "delete_segment" | "delete" =>
        Op.DeleteSegment(pd("start").orElse(Option(n.get("start")).map(_.asDouble())).get,
          pd("end").orElse(Option(n.get("end")).map(_.asDouble())).get)
      case "mark_bad" =>
        Op.MarkBad(Option(n.get("start")).map(_.asDouble()).get,
          Option(n.get("end")).map(_.asDouble()).get)
      case d if d.startsWith("derived:") =>
        Op.Derived(d.stripPrefix("derived:"),
          p.flatMap(o => Option(o.get("expr"))).map(_.asText())
            .getOrElse(throw new IllegalArgumentException(s"expr missing for $d")))
      case other => throw new IllegalArgumentException(s"unknown reference op: $other")
    }
  }

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
