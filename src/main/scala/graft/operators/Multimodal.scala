package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media (image/audio/video) is an
  * opaque `binary` payload column plus a typed metadata struct; the
  * decode / feature-extract / resize / frame-sample steps run as
  * typed per-partition kernels (`Dataset.mapPartitions`) — the Spark
  * shape for batched media UDFs. A real deployment swaps
  * [[decodeStub]] for an actual codec; the container has no media
  * libraries, so the decode is a DETERMINISTIC FAKE over the raw
  * bytes, while the schema, partitioning, batch iteration, and
  * cardinality changes are all real and oracle-checked (payloads are
  * fabricated from the ASCII `documents.text`, so DuckDB can verify
  * byte-level results via `ord(substr(text, …))`).
  *
  * Scale: kernels are per-partition streaming (no per-row JVM↔
  * anything boundary, no shuffle); frame-sampling is the only
  * cardinality-changing step and stays a narrow flatMap.
  */
object Multimodal {

  /** Opaque payload + typed metadata — the multimodal row shape. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)
  final case class Frame(doc_id: Long, frame_idx: Int, byte_val: Int)
  final case class Features(doc_id: Long, n_bytes: Long, mean_byte: Double,
      n_distinct: Int, first_byte: Int, last_byte: Int)
  final case class Resized(doc_id: Long, format: String, px: String)

  val FrameStride = 64
  val ResizeTo = 8

  /** Fabricate the media table: UTF-8 bytes of `text` as payload,
    * metadata derived from length (stands in for reading a parquet
    * of (id, binary, metadata) at scale — identical plan shape).
    */
  def media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("raw8").as("format"), lit(16).as("width"),
        ceil(length(col("text")) / 16.0).cast("int").as("height"))
      .as[MediaRow]
  }

  /** The stubbed "decoder": a real codec would parse `payload` per
    * its `format`; the fake treats the bytes themselves as the
    * decoded sample stream (sufficient to exercise every downstream
    * step deterministically).
    */
  def decodeStub(m: MediaRow): Array[Byte] = m.payload

  /** Frame-sample: one sample every [[FrameStride]] bytes — the
    * cardinality-changing kernel (video → frames).
    */
  val q55FrameSample: QueryDef = QueryDef.sql(
    "q55_frame_sample",
    s"""SELECT doc_id, unnest(generate_series(0, (len(text) - 1) // $FrameStride)) AS frame_idx
       |FROM documents ORDER BY doc_id, frame_idx""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    media(spark, dir).mapPartitions(_.flatMap { m =>
      val bytes = decodeStub(m)
      (0 until (bytes.length + FrameStride - 1) / FrameStride).iterator
        .map(k => Frame(m.doc_id, k, bytes(k * FrameStride) & 0xff))
    }).select(col("doc_id"), col("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Frame-sample with the sampled byte value (full byte-level
    * oracle via the ASCII payload equivalence).
    */
  val q56FrameBytes: QueryDef = QueryDef.sql(
    "q56_frame_bytes",
    s"""WITH f AS (SELECT doc_id, unnest(generate_series(0, (len(text) - 1) // $FrameStride)) AS frame_idx, text
       |  FROM documents)
       |SELECT doc_id, frame_idx,
       |  ord(substr(text, frame_idx * $FrameStride + 1, 1)) AS byte_val
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    media(spark, dir).mapPartitions(_.flatMap { m =>
      val bytes = decodeStub(m)
      (0 until (bytes.length + FrameStride - 1) / FrameStride).iterator
        .map(k => Frame(m.doc_id, k, bytes(k * FrameStride) & 0xff))
    }).toDF().orderBy("doc_id", "frame_idx")
  }

  /** Feature extraction: per-payload byte statistics (the stub for
    * an embedding/feature model over decoded media).
    */
  val q57DecodeFeatures: QueryDef = QueryDef.sql(
    "q57_decode_features",
    """WITH c AS (SELECT doc_id, text, list_transform(regexp_extract_all(text, '.'), ch -> ord(ch)) AS bs
      |  FROM documents)
      |SELECT doc_id, len(text)::BIGINT AS n_bytes,
      |  round(list_reduce(bs, (s, x) -> s + x) / len(text), 6) AS mean_byte,
      |  len(list_distinct(bs)) AS n_distinct,
      |  bs[1] AS first_byte, bs[len(text)] AS last_byte
      |FROM c ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    media(spark, dir).mapPartitions(_.map { m =>
      val bytes = decodeStub(m)
      val n = bytes.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += bytes(i) & 0xff; i += 1 }
      val mean = BigDecimal(sum.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      Features(m.doc_id, n.toLong, mean.toDouble, bytes.distinct.length,
        bytes(0) & 0xff, bytes(n - 1) & 0xff)
    }).toDF().orderBy("doc_id")
  }

  /** Resize: downsample every payload to a fixed 8-sample strip
    * (nearest-neighbor at positions ⌊j·n/8⌋) — fixed-size outputs
    * from variable-size media.
    */
  val q58Resize: QueryDef = QueryDef.sql(
    "q58_resize",
    s"""SELECT doc_id, 'raw8' AS format,
       |  array_to_string(list_transform(generate_series(0, ${ResizeTo - 1}),
       |    j -> ord(substr(text, (j * len(text)) // $ResizeTo + 1, 1))), ',') AS px
       |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    media(spark, dir).mapPartitions(_.map { m =>
      val bytes = decodeStub(m)
      val n = bytes.length.toLong
      val px = (0 until ResizeTo)
        .map(j => bytes(((j * n) / ResizeTo).toInt) & 0xff)
      Resized(m.doc_id, m.format, px.mkString(","))
    }).toDF().orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(q55FrameSample, q56FrameBytes, q57DecodeFeatures, q58Resize)
}
