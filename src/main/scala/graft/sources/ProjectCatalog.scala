package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Project catalog (S7, /root/reference/project_manager.py:10-72):
  * the driver-side JSON registry of trials + named recipes +
  * preferences. Data-plane state stays in Parquet; this is the small
  * catalog that binds a workspace together.
  */
object ProjectCatalog {

  final case class TrialEntry(path: String, participant: String = "",
      condition: String = "", status: String = "pending",
      summary: String = "", notes: String = "")

  final case class Project(trials: Vector[TrialEntry] = Vector.empty,
      recipes: Map[String, String] = Map.empty, // name → recipe JSON
      preferences: Map[String, String] = Map.empty)

  private val mapper = new ObjectMapper()

  def write(path: String, p: Project): Unit = {
    val root = mapper.createObjectNode()
    val ts = root.putArray("trials")
    p.trials.foreach { t =>
      val o = ts.addObject()
      o.put("path", t.path); o.put("participant", t.participant)
      o.put("condition", t.condition); o.put("status", t.status)
      o.put("summary", t.summary); o.put("notes", t.notes)
    }
    val rs = root.putObject("recipes")
    p.recipes.foreach { case (k, v) =>
      rs.set[com.fasterxml.jackson.databind.JsonNode](k, mapper.readTree(v))
    }
    val ps = root.putObject("preferences")
    p.preferences.foreach { case (k, v) => ps.put(k, v) }
    Files.writeString(Paths.get(path), mapper.writeValueAsString(root))
  }

  def read(path: String): Project = {
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    def txt(n: com.fasterxml.jackson.databind.JsonNode, f: String): String =
      Option(n.get(f)).map(_.asText()).getOrElse("")
    val trials = Option(root.get("trials")).map(_.elements().asScala.map(n =>
      TrialEntry(txt(n, "path"), txt(n, "participant"), txt(n, "condition"),
        Option(n.get("status")).map(_.asText()).getOrElse("pending"),
        txt(n, "summary"), txt(n, "notes"))).toVector).getOrElse(Vector.empty)
    def strMap(f: String, render: com.fasterxml.jackson.databind.JsonNode => String) =
      Option(root.get(f)).map(_.properties().asScala
        .map(e => e.getKey -> render(e.getValue)).toMap).getOrElse(Map.empty[String, String])
    Project(trials,
      strMap("recipes", n => mapper.writeValueAsString(n)),
      strMap("preferences", _.asText()))
  }
}
