package graft.sources.v2

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's trial-CSV interchange
  * format (S1's `DataModel.load_csv`, /root/reference/data_model.py:
  * 64-82) — the connector-shaped form of [[graft.sources.TrialReader]].
  *
  * This completes the engine's Spark-extension surface: expressions
  * (`functions/`), optimizer rules + physical operator (`plans/`),
  * streaming state ops (`streaming/`), and now a V2 connector with
  * the two scan optimizations that matter at 100 TB:
  *
  *   - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): only the
  *     projected columns are parsed — on a 59-column trial file a
  *     2-column query tokenizes the line and converts 2 fields, not
  *     59 (`.explain` shows the narrowed `ReadSchema`).
  *   - FILTER PUSHDOWN (`SupportsPushDownFilters`): comparison /
  *     null-test predicates on any column are evaluated DURING the
  *     scan, before rows are materialized (`.explain` shows them
  *     under `PushedFilters`), so a time-slice never surfaces
  *     out-of-range rows to the exec tree.
  *
  * Parallelism is one input partition per file — the trial-overlay
  * layout (many files, one per trial) is exactly the multi-file case
  * this fans out on. Values `""`/`"nan"`/`"NaN"` parse to null
  * (pandas-NaN normalization, same policy as `TrialReader.loadCsv`).
  * Quoting is NOT interpreted (reference fixtures are plain
  * comma-separated, no RFC-4180 quoting — data_model.py reads them
  * with pandas defaults and none of the shipped columns quote).
  *
  * Usage: `spark.read.format("graft.sources.v2.TrialSource")
  * .load(path)` where `path` is one CSV file or a directory of them.
  */
class TrialSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TrialSource.inferSchema(TrialSource.resolveFiles(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TrialTable(schema,
      TrialSource.resolveFiles(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

object TrialSource {

  /** `path` option or load(path) → the ordered list of CSV files. */
  private[v2] def resolveFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path"))
      .orElse(Option(options.get("paths")))
      .getOrElse(throw new IllegalArgumentException("TrialSource requires a path"))
    val f = new java.io.File(stripScheme(path))
    // a nonexistent path is a WRITE target: no files, empty schema
    if (f.isDirectory)
      f.listFiles().filter(_.getName.endsWith(".csv")).map(_.getPath).toSeq.sorted
    else if (f.isFile) Seq(f.getPath)
    else Seq.empty
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  /** Header from the first file; a column is DOUBLE when every
    * non-null value in the first file parses as a double, else
    * STRING — the same numeric-vs-metadata split the reference's
    * classifier applies (data_model.py:84-103).
    */
  private[v2] def inferSchema(files: Seq[String]): StructType = {
    if (files.isEmpty) return StructType(Nil) // fresh write target
    // fold the classification over EVERY file: a multi-task write can
    // legitimately put a header-only part first (a task with no rows),
    // and classifying from that one file alone typed every column
    // DOUBLE — string cells then parsed to null and collapsed whole
    // group-bys (caught by the sf0.1 stress run). Production paths
    // pass an explicit schema; inference is the convenience path and
    // must be right, not fast.
    var header: Array[String] = null
    var numeric: Array[Boolean] = null
    var seen: Array[Boolean] = null
    files.foreach { file =>
      val src = scala.io.Source.fromFile(file)
      try {
        val it = src.getLines()
        require(it.hasNext, s"empty csv $file")
        val h = it.next().split(",", -1).map(_.trim)
        if (header == null) {
          header = h
          numeric = Array.fill(header.length)(true)
          seen = Array.fill(header.length)(false)
        } else require(h.sameElements(header),
          s"csv header mismatch: $file has ${h.mkString(",")}, " +
            s"expected ${header.mkString(",")}")
        it.foreach { line =>
          val cells = line.split(",", -1)
          var i = 0
          while (i < header.length) {
            val c = if (i < cells.length) cells(i).trim else ""
            if (!isNullToken(c)) {
              seen(i) = true
              if (numeric(i) && parseDouble(c).isEmpty) numeric(i) = false
            }
            i += 1
          }
        }
      } finally src.close()
    }
    StructType(header.zipWithIndex.map { case (n, i) =>
      StructField(n, if (!seen(i) || numeric(i)) DoubleType else StringType)
    })
  }

  private[v2] def isNullToken(s: String): Boolean =
    s.isEmpty || s == "nan" || s == "NaN"

  private[v2] def parseDouble(s: String): Option[Double] =
    try {
      val d = java.lang.Double.parseDouble(s)
      if (d.isNaN) None else Some(d)
    } catch { case _: NumberFormatException => None }
}

class TrialTable(schema: StructType, files: Seq[String]) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    s"trial(${files.headOption.getOrElse("<new>")}${if (files.size > 1) ",…" else ""})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TrialScanBuilder(schema, files)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new TrialWriteBuilder(info.schema(),
      Option(info.options.get("path")).getOrElse(
        throw new IllegalArgumentException("TrialSource write requires a path")))
}

class TrialScanBuilder(fullSchema: StructType, files: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept the comparison/null-test shapes the scan can evaluate on
    * a single row; everything else stays with Spark (returned as
    * residual). Accepted filters are ALSO re-checked by Spark — V2
    * pushdown is an optimization, not a correctness contract — so
    * partial evaluation here can never produce wrong results.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, rest) = filters.partition(evaluable)
    pushed = acc
    rest
  }

  private def evaluable(f: Filter): Boolean = f match {
    case EqualTo(a, v) => simpleRef(a, v)
    case GreaterThan(a, v) => simpleRef(a, v)
    case GreaterThanOrEqual(a, v) => simpleRef(a, v)
    case LessThan(a, v) => simpleRef(a, v)
    case LessThanOrEqual(a, v) => simpleRef(a, v)
    case IsNull(a) => hasCol(a)
    case IsNotNull(a) => hasCol(a)
    case And(l, r) => evaluable(l) && evaluable(r)
    case _ => false
  }

  private def hasCol(a: String): Boolean = fullSchema.fieldNames.contains(a)
  private def simpleRef(a: String, v: Any): Boolean =
    hasCol(a) && (v.isInstanceOf[java.lang.Number] || v.isInstanceOf[String])

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new TrialScan(fullSchema, required, pushed, files)
}

class TrialScan(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], files: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TrialScan pushed=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => TrialFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TrialReaderFactory(fullSchema, required, pushed)
}

case class TrialFilePartition(path: String) extends InputPartition

class TrialReaderFactory(fullSchema: StructType, required: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TrialPartitionReader(fullSchema, required, pushed,
      partition.asInstanceOf[TrialFilePartition].path)
}

/** Streaming line reader for one file: tokenizes each line, evaluates
  * the pushed predicates on raw cells, and converts ONLY the required
  * columns into the output row.
  */
class TrialPartitionReader(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], path: String) extends PartitionReader[InternalRow] {

  private val src = scala.io.Source.fromFile(path)
  private val lines = src.getLines()
  private val header: Array[String] =
    if (lines.hasNext) lines.next().split(",", -1).map(_.trim) else Array.empty
  private val colIdx: Map[String, Int] = header.zipWithIndex.toMap
  private val outIdx: Array[Int] = required.fieldNames.map(n => colIdx(n))
  private var current: InternalRow = _

  private def cellAt(cells: Array[String], name: String): Option[String] = {
    val i = colIdx(name)
    val raw = if (i < cells.length) cells(i).trim else ""
    if (TrialSource.isNullToken(raw)) None else Some(raw)
  }

  /** Predicate evaluation over raw cells; comparisons are numeric
    * when the column inferred numeric, lexicographic otherwise
    * (matching what Spark would do after conversion). Null cells fail
    * every comparison, like SQL three-valued logic collapsing to
    * "don't emit".
    */
  private def eval(f: Filter, cells: Array[String]): Boolean = f match {
    case IsNull(a) => cellAt(cells, a).isEmpty
    case IsNotNull(a) => cellAt(cells, a).isDefined
    case And(l, r) => eval(l, cells) && eval(r, cells)
    case EqualTo(a, v) => cmp(a, v, cells).contains(0)
    case GreaterThan(a, v) => cmp(a, v, cells).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, v, cells).exists(_ >= 0)
    case LessThan(a, v) => cmp(a, v, cells).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(a, v, cells).exists(_ <= 0)
    case _ => true // unreachable: only evaluable() filters are pushed
  }

  private def cmp(a: String, v: Any, cells: Array[String]): Option[Int] =
    cellAt(cells, a).flatMap { raw =>
      fullSchema(a).dataType match {
        case DoubleType =>
          TrialSource.parseDouble(raw).map(d =>
            java.lang.Double.compare(d, v.asInstanceOf[java.lang.Number].doubleValue()))
        case _ => Some(raw.compareTo(String.valueOf(v)))
      }
    }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val cells = lines.next().split(",", -1)
      if (pushed.forall(eval(_, cells))) {
        val vals = new Array[Any](outIdx.length)
        var j = 0
        while (j < outIdx.length) {
          val i = outIdx(j)
          val raw = if (i < cells.length) cells(i).trim else ""
          vals(j) =
            if (TrialSource.isNullToken(raw)) null
            else required.fields(j).dataType match {
              case DoubleType => TrialSource.parseDouble(raw).map(Double.box).orNull
              case _ => UTF8String.fromString(raw)
            }
          j += 1
        }
        current = InternalRow.fromSeq(vals.toIndexedSeq)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}

/** V2 write path — the connector form of the S5 clean-CSV sink
  * ([[graft.sources.TrialReader.saveClean]], data_model.py:252-257).
  * Each task writes `part-<pid>.csv` (header + rows, nulls as the
  * empty token so a re-read round-trips to null) into a task-temp
  * file, renamed on task commit — rename-per-task gives the same
  * no-partial-files guarantee the FileOutputCommitter path has on a
  * local/HDFS-like filesystem. TRUNCATE clears prior part files.
  */
class TrialWriteBuilder(schema: StructType, path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new TrialBatchWrite(schema, path, doTruncate)
    }
}

class TrialBatchWrite(schema: StructType, path: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    if (truncate)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".csv") || f.getName.endsWith(".csv.tmp"))
        .foreach(_.delete())
    new TrialWriterFactory(schema, path)
  }
  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()
  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()
}

class TrialWriterFactory(schema: StructType, path: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new TrialDataWriter(schema, path, partitionId, taskId)
}

class TrialDataWriter(schema: StructType, path: String, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val tmp = new java.io.File(path, f"part-$partitionId%05d.csv.tmp-$taskId")
  private val out = new java.io.PrintWriter(
    new java.io.BufferedWriter(new java.io.FileWriter(tmp)))
  out.println(schema.fieldNames.mkString(","))

  override def write(row: InternalRow): Unit =
    out.println(schema.fields.indices.map { i =>
      if (row.isNullAt(i)) ""
      else schema.fields(i).dataType match {
        case DoubleType => row.getDouble(i).toString
        case LongType => row.getLong(i).toString
        case _ => row.getUTF8String(i).toString
      }
    }.mkString(","))

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    val dest = new java.io.File(path, f"part-$partitionId%05d.csv")
    if (!tmp.renameTo(dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
    new org.apache.spark.sql.connector.write.WriterCommitMessage {}
  }
  override def abort(): Unit = { out.close(); tmp.delete(); () }
  override def close(): Unit = ()
}
