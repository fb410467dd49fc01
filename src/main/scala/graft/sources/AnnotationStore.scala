package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.engine.{Annotation, EngineState, OpRecord}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Annotation JSON sink/source (S6,
  * /root/reference/data_model.py:259-305): round-trips
  * `{annotations, deletions, history, sample_rate}` including the
  * tolerant legacy parse of deletions as bare `[start, end]` pairs
  * (data_model.py:282-294).
  *
  * Driver-side JSON — annotation files are per-session catalog data,
  * not data-plane tables (those live as `Dataset[Annotation]`).
  */
object AnnotationStore {

  private val mapper = new ObjectMapper()

  final case class SessionMeta(annotations: Vector[Annotation],
      deletions: Vector[(Double, Double)], history: Vector[OpRecord],
      sampleRate: Double)

  def write(path: String, meta: SessionMeta): Unit = {
    val root = mapper.createObjectNode()
    val anns = root.putArray("annotations")
    meta.annotations.foreach { a =>
      val o = anns.addObject()
      o.put("start", a.start); o.put("end", a.end); o.put("label", a.label)
      o.put("track", a.track); o.put("color", a.color); o.put("id", a.id)
    }
    val dels = root.putArray("deletions")
    meta.deletions.foreach { case (s, e) =>
      val o = dels.addObject(); o.put("start", s); o.put("end", e)
    }
    val hist = root.putArray("history")
    meta.history.foreach { h =>
      val o = hist.addObject()
      o.put("description", h.description)
      val p = o.putObject("params"); h.params.foreach { case (k, v) => p.put(k, v) }
      o.put("start", h.start); o.put("end", h.end)
    }
    root.put("sample_rate", meta.sampleRate)
    Files.writeString(Paths.get(path), mapper.writeValueAsString(root))
  }

  def read(path: String): SessionMeta = {
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    val anns = arr(root, "annotations").map { n =>
      Annotation(n.get("start").asDouble(), n.get("end").asDouble(),
        n.get("label").asText(),
        opt(n, "track").map(_.asText()).getOrElse("default"),
        opt(n, "color").map(_.asText()).getOrElse("#4C78A8"),
        opt(n, "id").map(_.asLong()).getOrElse(0L))
    }
    val dels = arr(root, "deletions").map { n =>
      if (n.isArray) (n.get(0).asDouble(), n.get(1).asDouble()) // legacy pair
      else (n.get("start").asDouble(), n.get("end").asDouble())
    }
    val hist = arr(root, "history").map { n =>
      OpRecord(n.get("description").asText(),
        opt(n, "params").map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
        opt(n, "start").map(_.asDouble()).getOrElse(Double.NaN),
        opt(n, "end").map(_.asDouble()).getOrElse(Double.NaN))
    }
    SessionMeta(anns, dels, hist,
      opt(root, "sample_rate").map(_.asDouble()).getOrElse(120.0))
  }

  /** Restore an [[EngineState]] around an already-loaded frame. */
  def restore(df: org.apache.spark.sql.DataFrame, meta: SessionMeta): EngineState =
    EngineState(df, meta.annotations, meta.deletions, meta.history)

  private def arr(n: JsonNode, f: String): Vector[JsonNode] =
    opt(n, f).map(_.elements().asScala.toVector).getOrElse(Vector.empty)
  private def opt(n: JsonNode, f: String): Option[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull)
}
