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

  final case class AHash(doc_id: Long, ahash: Long)

  /** q197: perceptual-hash (average-hash) media dedup — the
    * image-pipeline cousin of SimHash: decode, sample ≤63 frames at
    * [[FrameStride]], threshold each against the clip's mean level
    * (one bit per frame), pack to a 63-bit signature, and group
    * equal signatures into duplicate-media clusters. A real aHash
    * thresholds 8×8 downsampled luma; the stub thresholds the fake
    * decode's byte frames — the kernel/bucketing plumbing is
    * identical. 63 bits (not 64) so the packed signature stays a
    * non-negative int64 on engines whose integer sums promote
    * differently at the sign bit.
    *
    * Scale shape: the signature is a narrow per-partition kernel (no
    * shuffle), clustering is ONE hash aggregate on the 8-byte
    * signature — never a pairwise comparison; a Hamming-tolerant
    * variant would add q44's ball-probe join on this same column.
    */
  val q197MediaAhash: QueryDef = QueryDef.sql(
    "q197_media_ahash",
    s"""WITH ks AS (SELECT doc_id, text,
       |    unnest(generate_series(0, least((len(text) - 1) // $FrameStride, 62))) AS k
       |  FROM documents),
       |f AS (SELECT doc_id, k, ord(substr(text, k * $FrameStride + 1, 1)) AS b FROM ks),
       |m AS (SELECT doc_id, CAST(sum(b) AS BIGINT) AS sb, count(*) AS nf
       |  FROM f GROUP BY doc_id),
       |h AS (SELECT f.doc_id,
       |    CAST(sum(CASE WHEN f.b > CAST(m.sb AS DOUBLE) / m.nf
       |      THEN 1::BIGINT << f.k ELSE 0 END) AS BIGINT) AS ahash
       |  FROM f JOIN m USING (doc_id) GROUP BY f.doc_id),
       |g AS (SELECT ahash, count(*) AS n_group, min(doc_id) AS canonical
       |  FROM h GROUP BY ahash HAVING count(*) >= 2)
       |SELECT h.doc_id, h.ahash, g.n_group, g.canonical
       |FROM h JOIN g USING (ahash) ORDER BY h.doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val sigs = media(spark, dir).mapPartitions(_.map { m =>
      val bytes = decodeStub(m)
      val nf = math.min((bytes.length - 1) / FrameStride + 1, 63)
      val fs = Array.tabulate(nf)(k => bytes(k * FrameStride) & 0xff)
      val mean = fs.map(_.toLong).sum.toDouble / nf
      var h = 0L
      var k = 0
      while (k < nf) { if (fs(k) > mean) h |= 1L << k; k += 1 }
      AHash(m.doc_id, h)
    }).toDF()
    val groups = sigs.groupBy("ahash")
      .agg(count(lit(1)).as("n_group"), min("doc_id").as("canonical"))
      .filter(col("n_group") >= 2)
    sigs.join(groups, Seq("ahash"))
      .select("doc_id", "ahash", "n_group", "canonical")
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(q55FrameSample, q56FrameBytes, q57DecodeFeatures,
    q58Resize, q197MediaAhash)
}
