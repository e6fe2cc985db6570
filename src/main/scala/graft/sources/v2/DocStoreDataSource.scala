package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector modeling the reference's document-DB
  * (Mongo) insert path (SURVEY §1.4 K4/K5, mongo.ipynb `insert_many`;
  * advanced.ipynb:225) as a first-class Spark batch sink with the full
  * V2 commit protocol — the zero-egress container has no Mongo, so the
  * wire format is JSON-lines files (one document object per row), but
  * the part that matters at 100 TB is the PROTOCOL, and that is real:
  *
  *  - **task isolation**: every DataWriter writes to a private
  *    `_tmp-<task>-<attempt>` file — concurrent speculative attempts
  *    of the same task never interfere;
  *  - **commit-by-rename**: a task's output becomes visible atomically
  *    at `commit()` (the rename), never while rows are streaming out —
  *    a reader of the directory sees only completed task files;
  *  - **abort cleanup**: a failed/killed attempt's `abort()` removes
  *    its temp file, so retries cannot double-write documents — the
  *    exactly-once-per-task guarantee `insert_many` batching needs;
  *  - **job-level finalize**: `BatchWrite.commit` stamps `_SUCCESS`
  *    only after every task committed; `BatchWrite.abort` sweeps any
  *    stragglers. A downstream consumer gates on the marker, exactly
  *    as with Hadoop-committer outputs.
  *
  * Usage: `df.write.format("graft.sources.v2.DocStoreDataSource")
  * .option("path", dir).mode("append").save()`. Append-only by design
  * (a document insert), like the reference's `insert_many`.
  */
class DocStoreDataSource extends TableProvider {
  // a write accepts the incoming frame's schema (Spark passes it to
  // getTable only when external metadata is supported)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // read path: infer from a bounded sample of the first committed
    // part file (schema-on-read, like a document DB). Writes never get
    // here — Spark hands the incoming frame's schema to getTable.
    val path = options.get("path")
    if (path == null || path.isEmpty) new StructType()
    else DocStoreJson.inferSchema(path)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "docstore sink requires .option(\"path\", <output dir>)")
    new DocStoreTable(path, schema)
  }
}

private[v2] class DocStoreTable(path: String, tableSchema: StructType)
  extends Table with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String = s"docstore($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new DocStoreScanBuilder(path, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new DocStoreBatchWrite(path, info.schema())
      }
    }
}

private[v2] case class DocStoreCommitMessage(committedFile: String,
    statsJsonLine: String)
  extends WriterCommitMessage

private[v2] class DocStoreBatchWrite(dir: String, schema: StructType)
  extends BatchWrite {

  // Job-scoped id embedded in every file name this job writes: abort
  // must only ever touch THIS job's files — the sink is append-only,
  // and sweeping by bare prefix would destroy PREVIOUS jobs' committed
  // output while their _SUCCESS still gates green downstream.
  private val jobId = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(dir).mkdirs()
    new DocStoreWriterFactory(dir, schema, jobId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // Sweep THIS job's orphaned temp files first: a task attempt whose
    // executor JVM died never ran abort(), but its successful retry
    // committed under a different attempt file name — the dead
    // attempt's _tmp-<jobId>-* would otherwise sit in the directory
    // forever. Scoped to the temp prefix only: committed part- files
    // (this job's and prior jobs') are untouched.
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(s"_tmp-$jobId-"))
      .foreach(_.delete())
    // zone map BEFORE the marker (markers-as-truth: a reader that
    // gates on _SUCCESS must find the stats of every file it scans)
    val lines = messages.collect {
      case DocStoreCommitMessage(_, stats) if stats.nonEmpty => stats
    }
    if (lines.nonEmpty) {
      val zm = new java.io.File(dir, s"_zonemap-$jobId.json")
      val zw = new java.io.PrintWriter(zm, "UTF-8")
      try lines.foreach(zw.println) finally zw.close()
    }
    // every task committed — stamp the job-level marker
    val ok = new java.io.File(dir, "_SUCCESS")
    val w = new java.io.PrintWriter(ok, "UTF-8")
    try w.print("") finally w.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // sweep ONLY this job's files: temp files of attempts that never
    // reached task-abort (executor loss) and files its tasks already
    // committed — prior jobs' appended output stays untouched
    val d = new java.io.File(dir)
    val stale = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.contains(jobId))
    stale.foreach(_.delete())
  }
}

private[v2] class DocStoreWriterFactory(dir: String, schema: StructType,
    jobId: String)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DocStoreWriter(dir, schema, jobId, partitionId, taskId)
}

/** One task attempt's writer: rows stream to a private temp file;
  * commit renames it into visibility; abort deletes it. */
private[v2] class DocStoreWriter(dir: String, schema: StructType,
    jobId: String, partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val tmp = new java.io.File(dir, s"_tmp-$jobId-$partitionId-$taskId")
  // zone-map stats ride the rows already streaming through this task
  private val zone = new DocStoreZonemap.Collector(schema)
  private val out = new java.io.PrintWriter(
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(tmp), java.nio.charset.StandardCharsets.UTF_8)))

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** JSON has no NaN/Infinity literal — a bare `NaN` token corrupts
    * the whole line for every reader. Non-finite values become null. */
  private def finiteOrNull(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "null"

  private def scalarJson(dt: DataType, row: InternalRow, ord: Int): String =
    dt match {
      case StringType => "\"" + jsonEscape(row.getUTF8String(ord).toString) + "\""
      case LongType => row.getLong(ord).toString
      case IntegerType => row.getInt(ord).toString
      case DoubleType => finiteOrNull(row.getDouble(ord))
      case FloatType => finiteOrNull(row.getFloat(ord).toDouble)
      case BooleanType => row.getBoolean(ord).toString
      case ShortType => row.getShort(ord).toString
      case ByteType => row.getByte(ord).toString
      case other => throw new UnsupportedOperationException(
        s"docstore sink: unsupported field type ${other.simpleString}")
    }

  private def arrayJson(et: DataType, row: InternalRow, ord: Int): String = {
    val arr = row.getArray(ord)
    val sb = new StringBuilder("[")
    var i = 0
    while (i < arr.numElements()) {
      if (i > 0) sb.append(',')
      if (arr.isNullAt(i)) sb.append("null")
      else et match {
        case StringType => sb.append("\"" + jsonEscape(arr.getUTF8String(i).toString) + "\"")
        case LongType => sb.append(arr.getLong(i))
        case IntegerType => sb.append(arr.getInt(i))
        case DoubleType => sb.append(finiteOrNull(arr.getDouble(i)))
        case FloatType => sb.append(finiteOrNull(arr.getFloat(i).toDouble))
        case BooleanType => sb.append(arr.getBoolean(i))
        case other => throw new UnsupportedOperationException(
          s"docstore sink: unsupported array element type ${other.simpleString}")
      }
      i += 1
    }
    sb.append(']').toString
  }

  override def write(row: InternalRow): Unit = {
    zone.observe(row)
    val sb = new StringBuilder("{")
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      if (i > 0) sb.append(',')
      sb.append('"').append(jsonEscape(f.name)).append("\":")
      if (row.isNullAt(i)) sb.append("null")
      else f.dataType match {
        case ArrayType(et, _) => sb.append(arrayJson(et, row, i))
        case dt => sb.append(scalarJson(dt, row, i))
      }
      i += 1
    }
    // explicit '\n', not println: the JSON-lines contract is UTF-8 with
    // \n terminators byte-for-byte on every platform — println would
    // emit \r\n under a CRLF line.separator.
    sb.append('}').append('\n')
    out.print(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    // PrintWriter swallows IOExceptions — a full disk mid-write would
    // otherwise commit a silently truncated file. checkError() flushes
    // and reports; fail the task (Spark retries it) instead.
    if (out.checkError())
      throw new java.io.IOException(
        s"docstore sink: write error on $tmp — refusing to commit a truncated file")
    out.close()
    if (out.checkError())
      throw new java.io.IOException(s"docstore sink: close error on $tmp")
    val fin = new java.io.File(dir, s"part-$jobId-$partitionId-$taskId.jsonl")
    if (!tmp.renameTo(fin))
      throw new java.io.IOException(s"docstore sink: rename $tmp -> $fin failed")
    DocStoreCommitMessage(fin.getName, zone.toJsonLine(fin.getName))
  }

  override def abort(): Unit = {
    out.close()
    tmp.delete()
  }

  override def close(): Unit = out.close()
}
