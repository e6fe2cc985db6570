package graft.sources.v2

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** READ side of the document store (reference read path:
  * mongo.ipynb `find` / `find_one`) — a DataSource V2 scan over the
  * JSON-lines layout the sink writes, closing the round trip V2-native
  * both ways.
  *
  *  - **visibility = commit-by-rename**: only `part-*.jsonl` files are
  *    scanned — the sink's task commit renames temp files into that
  *    namespace atomically, so a concurrent reader never sees a
  *    half-written file (the `_tmp-*` namespace is invisible);
  *  - **projection pushdown**: `pruneColumns` narrows parsing to the
  *    required fields — the streaming tokenizer SKIPS the values of
  *    unprojected keys (`skipChildren`), so a 2-column projection of a
  *    30-field document never materializes the other 28;
  *  - **filter pushdown**: comparisons/null-tests/IN/string-matches on
  *    top-level atomic fields evaluate inside the reader BEFORE a row
  *    is built, skipping non-matching documents at parse time.
  *    Conservatively, every filter is ALSO returned as residual, so
  *    Spark re-evaluates post-scan — the pushdown is a performance
  *    contract, never the correctness authority (exactly the posture a
  *    third-party store's type coercions warrant);
  *  - **parallelism**: one input partition per committed part file —
  *    the sink writes one file per task, so read parallelism mirrors
  *    write parallelism. (Files are not byte-range split; the unit of
  *    work is the writer task's output, as with Mongo chunk scans.)
  */
private[v2] class DocStoreScanBuilder(dir: String, tableSchema: StructType)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(DocStoreJson.supportedFilter(tableSchema, _))
    filters // all residual: Spark re-checks, reader pre-skips
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new DocStoreScan(dir, tableSchema, required, pushed)
}

private[v2] case class DocStoreInputPartition(file: String,
    dead: Array[Int]) extends InputPartition

private[v2] class DocStoreScan(dir: String, tableSchema: StructType,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"docstore($dir) ReadSchema: ${required.catalogString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // liveFiles: committed part files minus those a COMPLETED
    // compaction replaced (manifest rule) — every compaction crash
    // state reads consistently, never with duplicate rows
    val files = DocStoreCompact.liveFiles(dir).map(_.getAbsolutePath)
    val dv = DocStoreDeletes.load(dir)
    val zm = if (pushed.nonEmpty || dv.nonEmpty) DocStoreZonemap.load(dir)
      else Map.empty[String, DocStoreZonemap.FileStats]
    // Two-level file skipping, both conservative:
    //  - zone maps: drop files whose stats PROVE no row matches a
    //    pushed filter. Valid even for files with deletions — deletes
    //    only REMOVE rows, so stats describe a superset and any
    //    "no row can match" proof carries to the live subset;
    //  - deletion vectors: drop files whose EXACT zonemap row count
    //    equals their dead-position count — fully deleted, never
    //    opened. Files without stats can't prove fullness and scan.
    val kept = files.filter { path =>
      val name = new java.io.File(path).getName
      val stats = zm.get(name)
      val nDead = dv.get(name).map(_.size).getOrElse(0)
      val fullyDead = stats.exists(fs => nDead > 0 && nDead >= fs.rows)
      !fullyDead &&
        !stats.exists(fs => pushed.exists(DocStoreZonemap.provesEmpty(fs, _)))
    }
    kept.map { path =>
      val name = new java.io.File(path).getName
      DocStoreInputPartition(path,
        dv.get(name).map(_.toArray).getOrElse(Array.empty[Int])): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocStoreReaderFactory(tableSchema, required, pushed)
}

private[v2] class DocStoreReaderFactory(tableSchema: StructType,
    required: StructType, pushed: Array[Filter])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocStoreInputPartition]
    new DocStoreReader(p.file, tableSchema, required, pushed, p.dead)
  }
}

private[v2] class DocStoreReader(file: String, tableSchema: StructType,
    required: StructType, pushed: Array[Filter], deadPositions: Array[Int])
  extends PartitionReader[InternalRow] {

  // parse the union of projected fields and filter references; skip
  // everything else at the tokenizer level
  private val wanted: Set[String] =
    required.fieldNames.toSet ++ pushed.flatMap(_.references)

  // deletion-vector subtraction: `pos` counts NON-EMPTY lines (the DV
  // position convention, DocStoreDeletes) — a dead row is skipped
  // before it is even parsed
  private val dead = {
    val bs = new java.util.BitSet()
    deadPositions.foreach(bs.set)
    bs
  }
  private var pos = -1

  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(new java.io.FileInputStream(file),
      java.nio.charset.StandardCharsets.UTF_8))
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      if (line.nonEmpty) {
        pos += 1
        if (!dead.get(pos)) {
          val doc = DocStoreJson.parseLine(line, wanted)
          if (pushed.forall(DocStoreJson.eval(_, doc))) {
            val values = required.fields.map(f =>
              DocStoreJson.toCatalyst(doc.getOrElse(f.name, null), f.dataType,
                f.name))
            row = new GenericInternalRow(values.asInstanceOf[Array[Any]])
            return true
          }
        }
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row

  override def close(): Unit = in.close()
}

/** JSON-lines parsing, filter evaluation, catalyst conversion, and
  * schema inference for the document store — Jackson streaming (on
  * Spark's classpath), one object per line. */
private[v2] object DocStoreJson {

  private val factory = new JsonFactory()

  /** Parse one line, materializing only `wanted` top-level fields. */
  def parseLine(line: String, wanted: Set[String]): Map[String, Any] = {
    val p = factory.createParser(line)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT,
        s"docstore: line is not a JSON object: ${line.take(80)}")
      val m = scala.collection.mutable.Map.empty[String, Any]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        val tok = p.nextToken()
        if (wanted(name)) m(name) = parseValue(p, tok)
        else if (tok == JsonToken.START_ARRAY || tok == JsonToken.START_OBJECT)
          p.skipChildren()
      }
      m.toMap
    } finally p.close()
  }

  private def parseValue(p: com.fasterxml.jackson.core.JsonParser,
      tok: JsonToken): Any = tok match {
    case JsonToken.VALUE_STRING => p.getText
    case JsonToken.VALUE_NUMBER_INT => p.getLongValue
    case JsonToken.VALUE_NUMBER_FLOAT => p.getDoubleValue
    case JsonToken.VALUE_TRUE => true
    case JsonToken.VALUE_FALSE => false
    case JsonToken.VALUE_NULL => null
    case JsonToken.START_ARRAY =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      var t = p.nextToken()
      while (t != JsonToken.END_ARRAY) { buf += parseValue(p, t); t = p.nextToken() }
      buf.toSeq
    case other =>
      throw new UnsupportedOperationException(s"docstore: JSON token $other")
  }

  /** Filters the reader can evaluate exactly on parsed JSON values:
    * top-level atomic fields only. */
  def supportedFilter(schema: StructType, f: Filter): Boolean = {
    def atomic(attr: String): Boolean =
      schema.fields.find(_.name == attr).exists(_.dataType match {
        case _: ArrayType | _: StructType | _: MapType => false
        case _ => true
      })
    f match {
      case EqualTo(a, _) => atomic(a)
      case GreaterThan(a, _) => atomic(a)
      case GreaterThanOrEqual(a, _) => atomic(a)
      case LessThan(a, _) => atomic(a)
      case LessThanOrEqual(a, _) => atomic(a)
      case In(a, _) => atomic(a)
      case IsNull(a) => atomic(a)
      case IsNotNull(a) => atomic(a)
      case StringStartsWith(a, _) => atomic(a)
      case StringEndsWith(a, _) => atomic(a)
      case StringContains(a, _) => atomic(a)
      case _ => false
    }
  }

  /** SQL three-valued comparison on parsed JSON scalars: a missing or
    * null field fails every comparison except IsNull. */
  private def cmp(v: Any, lit: Any): Option[Int] = (v, lit) match {
    case (null, _) | (_, null) => None
    case (a: Long, b: Number) if b.isInstanceOf[java.lang.Long] ||
        b.isInstanceOf[java.lang.Integer] || b.isInstanceOf[java.lang.Short] ||
        b.isInstanceOf[java.lang.Byte] =>
      Some(java.lang.Long.compare(a, b.longValue()))
    case (a: Long, b: Number) => Some(java.lang.Double.compare(a.toDouble, b.doubleValue()))
    case (a: Double, b: Number) => Some(java.lang.Double.compare(a, b.doubleValue()))
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
    case _ => None // type mismatch: not comparable, filter fails
  }

  def eval(f: Filter, doc: Map[String, Any]): Boolean = f match {
    case EqualTo(a, v) => cmp(doc.getOrElse(a, null), v).contains(0)
    case GreaterThan(a, v) => cmp(doc.getOrElse(a, null), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(doc.getOrElse(a, null), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(doc.getOrElse(a, null), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(doc.getOrElse(a, null), v).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(doc.getOrElse(a, null), v).contains(0))
    case IsNull(a) => doc.getOrElse(a, null) == null
    case IsNotNull(a) => doc.getOrElse(a, null) != null
    case StringStartsWith(a, pre) => doc.getOrElse(a, null) match {
      case s: String => s.startsWith(pre); case _ => false }
    case StringEndsWith(a, suf) => doc.getOrElse(a, null) match {
      case s: String => s.endsWith(suf); case _ => false }
    case StringContains(a, sub) => doc.getOrElse(a, null) match {
      case s: String => s.contains(sub); case _ => false }
    // And/Or compose safely under let-pass semantics: an unsupported
    // child evaluates true, so And can only over-keep (residual fixes
    // it) and a FALSE from a supported And-child is exact — the row
    // truly fails. Not is NOT safe to compose (let-pass would flip to
    // drop) and stays unsupported.
    case And(l, r) => eval(l, doc) && eval(r, doc)
    case Or(l, r) => eval(l, doc) || eval(r, doc)
    case _ => true // unsupported filters are residual-only; let pass
  }

  /** True iff [[eval]] is EXACT for `f` — every leaf is in the
    * supported algebra and no let-pass default can fire. The deletes
    * path requires this: there, eval is the authority, not a pre-skip
    * with a residual behind it. */
  def evaluableExactly(f: Filter): Boolean = f match {
    case And(l, r) => evaluableExactly(l) && evaluableExactly(r)
    case Or(l, r) => evaluableExactly(l) && evaluableExactly(r)
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
         _: LessThanOrEqual | _: In | _: IsNull | _: IsNotNull |
         _: StringStartsWith | _: StringEndsWith | _: StringContains => true
    case _ => false
  }

  def toCatalyst(v: Any, dt: DataType, field: String): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (l: Long, LongType) => l
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, ShortType) => l.toShort
    case (l: Long, ByteType) => l.toByte
    case (l: Long, DoubleType) => l.toDouble
    case (l: Long, FloatType) => l.toFloat
    case (d: Double, DoubleType) => d
    case (d: Double, FloatType) => d.toFloat
    case (b: Boolean, BooleanType) => b
    case (s: Seq[_], ArrayType(et, _)) =>
      new GenericArrayData(s.map(toCatalyst(_, et, field)).toArray)
    case (other, StringType) => UTF8String.fromString(other.toString)
    case (other, t) => throw new UnsupportedOperationException(
      s"docstore: cannot read JSON value $other as ${t.simpleString} (field $field)")
  }

  /** Schema inference: sample up to `maxLines` lines from EACH of the
    * first `maxFiles` committed part files (lexicographic —
    * deterministic) plus the newest `maxFiles` rewritten
    * (`part-update-*`) and compacted (`part-compact-*`) files.
    * Sampling the rewritten tail matters because the store EVOLVES:
    * an updateWhere can add fields that exist only in its rewritten
    * part file, and a head-only sample would never see them. Integral numbers → long, other numbers → double; long +
    * double widen to double; any other kind conflict widens to
    * string; arrays merge element-wise. Field order is first-seen
    * across the sampled files; all fields nullable. */
  def inferSchema(dir: String, maxLines: Int = 200,
      maxFiles: Int = 8): StructType = {
    val live = DocStoreCompact.liveFiles(dir)
    if (live.isEmpty) return new StructType()
    // head of the lexicographic order (stable base sample) PLUS the
    // newest rewritten/compacted files: `part-update-*` and
    // `part-compact-*` sort AFTER plain `part-*.jsonl`, so on any
    // table with >= maxFiles plain files a head-only sample would
    // never see the fields an updateWhere SET added — the very
    // evolution multi-file sampling exists for
    val evolved = live
      .filter(f => f.getName.startsWith("part-update-") ||
        f.getName.startsWith("part-compact-"))
      .sortBy(_.getName)(Ordering[String].reverse).take(maxFiles)
    val files = (live.take(maxFiles) ++ evolved).distinct.map(_.getAbsolutePath)
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val types = scala.collection.mutable.Map.empty[String, DataType]
    files.foreach { path =>
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(new java.io.FileInputStream(path),
          java.nio.charset.StandardCharsets.UTF_8))
      try {
        var n = 0
        var line = in.readLine()
        while (line != null && n < maxLines) {
          if (line.nonEmpty) {
            for ((k, v) <- parseLineOrdered(line)) {
              if (!types.contains(k)) order += k
              types(k) = merge(types.getOrElse(k, NullType), typeOf(v))
            }
            n += 1
          }
          line = in.readLine()
        }
      } finally in.close()
    }
    StructType(order.map(k => StructField(k,
      types(k) match { case NullType => StringType; case t => t },
      nullable = true)).toArray)
  }

  private[v2] def parseLineOrdered(line: String): Seq[(String, Any)] = {
    val p = factory.createParser(line)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Any)]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        buf += name -> parseValue(p, p.nextToken())
      }
      buf.toSeq
    } finally p.close()
  }

  private def typeOf(v: Any): DataType = v match {
    case null => NullType
    case _: String => StringType
    case _: Long => LongType
    case _: Double => DoubleType
    case _: Boolean => BooleanType
    case s: Seq[_] =>
      ArrayType(s.map(typeOf).foldLeft(NullType: DataType)(merge) match {
        case NullType => StringType
        case t => t
      }, containsNull = true)
  }

  private def merge(a: DataType, b: DataType): DataType = (a, b) match {
    case (NullType, x) => x
    case (x, NullType) => x
    case (x, y) if x == y => x
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (ArrayType(x, _), ArrayType(y, _)) =>
      ArrayType(merge(x, y), containsNull = true)
    case _ => StringType
  }
}
