package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Plugin directory discovery — the reference's `PluginManager`
  * (plugin_system.py:13-46): scan a directory for `*.json` /
  * `*.plugin` files, parse each as a plugin descriptor, silently skip
  * unreadable ones, list menu entries, look up by name-or-id.
  *
  * A plugin body is either `{"operations": [op, …]}` or a single op
  * object (main.py:803 `plugin.get("operations", [plugin])`); ops are
  * the `filter` / `derived` shapes, compiled to [[Recipes.Op]] so a
  * discovered plugin replays through the same one-job
  * [[Recipes.compile]] path as any recipe.
  */
object Plugins {

  /** One discovered plugin: display name (from `name` or `id`, when
    * present), compiled ops, and the file it came from.
    */
  final case class Plugin(name: Option[String], ops: Seq[Recipes.Op], source: Path)

  private val mapper = new ObjectMapper()

  /** Scan `dir` for plugin files (`.json` / `.plugin`, case-
    * insensitive), parsing each; unreadable or unparsable files are
    * skipped like the reference's bare `except: continue`. Returns
    * plugins sorted by file name for determinism.
    */
  def loadDirectory(dir: String): Seq[Plugin] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    Files.list(d).iterator().asScala.toSeq
      .filter { p =>
        val n = p.getFileName.toString.toLowerCase
        n.endsWith(".json") || n.endsWith(".plugin")
      }
      .sortBy(_.getFileName.toString)
      .flatMap { p =>
        try Some(parse(mapper.readTree(Files.readString(p)), p))
        catch { case _: Exception => None }
      }
  }

  /** Menu entries: the names of every named plugin, in scan order
    * (plugin_system.py:34-40).
    */
  def menuEntries(plugins: Seq[Plugin]): Seq[String] = plugins.flatMap(_.name)

  /** Lookup by name (plugin_system.py:42-46: `name` or `id` match —
    * both normalize into [[Plugin.name]] here).
    */
  def get(plugins: Seq[Plugin], name: String): Option[Plugin] =
    plugins.find(_.name.contains(name))

  private def parse(root: JsonNode, source: Path): Plugin = {
    val name = Option(root.get("name")).orElse(Option(root.get("id")))
      .filter(_.isTextual).map(_.asText())
    val opNodes =
      if (root.has("operations")) root.get("operations").elements().asScala.toSeq
      else Seq(root)
    Plugin(name, opNodes.flatMap(parseOp), source)
  }

  /** One plugin op (main.py:804-820): `filter` applies a named filter
    * over channels (default `moving_average`); `derived` adds an
    * expression column (default name `derived`, dropped without an
    * expr — the reference's `if expr:` guard). Unknown types are
    * ignored like the reference's `op_type` dispatch.
    */
  private def parseOp(op: JsonNode): Option[Recipes.Op] =
    Option(op.get("type")).map(_.asText("")).getOrElse("") match {
      case "filter" =>
        val channels = Option(op.get("channels"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
        val filter = Option(op.get("filter")).map(_.asText()).getOrElse("moving_average")
        val params = Option(op.get("params")).map { p =>
          p.properties().asScala.iterator
            .filter(_.getValue.isNumber)
            .map(e => e.getKey -> e.getValue.asDouble())
            .toMap
        }.getOrElse(Map.empty[String, Double])
        val strParams = Option(op.get("params")).map { p =>
          p.properties().asScala.iterator
            .filter(_.getValue.isTextual)
            .map(e => e.getKey -> e.getValue.asText())
            .toMap
        }.getOrElse(Map.empty[String, String])
        Some(Recipes.Op.Filter(filter, params, channels, None, strParams))
      case "derived" =>
        Option(op.get("expr")).filter(_.isTextual).map { e =>
          val out = Option(op.get("name")).map(_.asText()).getOrElse("derived")
          Recipes.Op.Derived(out, e.asText())
        }
      case _ => None
    }
}
