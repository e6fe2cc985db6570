package graft.sources.v2

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** File-level zone maps for the document store: per-column min/max and
  * null counts collected BY THE WRITING TASK (the rows stream through
  * it anyway — the stats are free), carried to the driver in the task
  * commit message, and persisted as one `_zonemap-<jobId>.json` per
  * write job at job commit, BEFORE `_SUCCESS` (markers-as-truth order:
  * a reader that sees the marker sees the stats).
  *
  * At scan planning, [[prune]] drops part files whose value range
  * cannot satisfy the pushed filters — the reader never opens them.
  * This is the file-skipping layer every lakehouse format keys reads
  * on (parquet row-group stats, Delta/Iceberg file stats): on a
  * range-clustered corpus a point or range predicate reduces a
  * 10,000-file scan to the handful of overlapping files, independent
  * of row-level pushdown.
  *
  * Correctness posture (same as the row-level pushdown's): pruning is
  * CONSERVATIVE — a file is skipped only when its stats PROVE no row
  * can match. Numeric columns only (integral ranges compared as exact
  * longs, fractional as doubles — never cross-kind, so 2⁵³ rounding
  * can't mis-prune); files without stats (older writers, hand-dropped
  * files) are always scanned; filters not understood here never prune.
  * Row-level re-evaluation still runs behind it, and Spark's own
  * residual re-check behind that.
  */
object DocStoreZonemap {

  /** Per-column file statistics. `kind` ∈ i (integral, exact longs) /
    * f (fractional, doubles). A column absent from the map had an
    * unsupported type. */
  final case class ColStats(kind: Char, iLo: Long, iHi: Long,
      fLo: Double, fHi: Double, nulls: Long, nonNulls: Long)

  final case class FileStats(rows: Long, cols: Map[String, ColStats])

  /** Mutable per-task collector (one per writer). */
  final class Collector(schema: StructType) {
    private val tracked: Array[Int] = schema.fields.zipWithIndex.collect {
      case (f, i) if supportedType(f.dataType) => i
    }
    private val stats = new java.util.HashMap[String, ColStats]()
    private var rowCount = 0L

    def observe(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      rowCount += 1
      var t = 0
      while (t < tracked.length) {
        val i = tracked(t)
        val f = schema(i)
        val name = f.name
        val prev = stats.get(name)
        if (row.isNullAt(i)) {
          stats.put(name,
            if (prev == null) ColStats(kindOf(f.dataType), 0L, 0L, 0d, 0d, 1L, 0L)
            else prev.copy(nulls = prev.nulls + 1))
        } else kindOf(f.dataType) match {
          case 'i' =>
            val v = f.dataType match {
              case LongType => row.getLong(i)
              case IntegerType => row.getInt(i).toLong
              case ShortType => row.getShort(i).toLong
              case ByteType => row.getByte(i).toLong
              case other => throw new IllegalStateException(other.simpleString)
            }
            stats.put(name,
              if (prev == null || prev.nonNulls == 0L)
                ColStats('i', v, v, 0d, 0d,
                  if (prev == null) 0L else prev.nulls, 1L)
              else prev.copy(iLo = math.min(prev.iLo, v),
                iHi = math.max(prev.iHi, v), nonNulls = prev.nonNulls + 1))
          case 'f' =>
            val v = f.dataType match {
              case DoubleType => row.getDouble(i)
              case FloatType => row.getFloat(i).toDouble
              case other => throw new IllegalStateException(other.simpleString)
            }
            // NaN poisons min/max ordering — a file containing one is
            // conservatively unprunable on that column
            val (lo, hi) =
              if (v.isNaN) (Double.NegativeInfinity, Double.PositiveInfinity)
              else (v, v)
            stats.put(name,
              if (prev == null || prev.nonNulls == 0L)
                ColStats('f', 0L, 0L, lo, hi,
                  if (prev == null) 0L else prev.nulls, 1L)
              else prev.copy(fLo = math.min(prev.fLo, lo),
                fHi = math.max(prev.fHi, hi), nonNulls = prev.nonNulls + 1))
        }
        t += 1
      }
    }

    /** One JSON line `{"file":…,"rows":…,"cols":{…}}`. */
    def toJsonLine(fileName: String): String = {
      val sb = new StringBuilder
      sb.append("{\"file\":\"").append(fileName).append("\",\"rows\":")
        .append(rowCount).append(",\"cols\":{")
      var first = true
      stats.forEach { (name, c) =>
        if (!first) sb.append(',')
        first = false
        sb.append('"').append(name).append("\":{\"kind\":\"").append(c.kind)
          .append("\",\"nulls\":").append(c.nulls)
          .append(",\"nonNulls\":").append(c.nonNulls)
        if (c.kind == 'i')
          sb.append(",\"lo\":").append(c.iLo).append(",\"hi\":").append(c.iHi)
        else
          sb.append(",\"lo\":").append(jsonDouble(c.fLo))
            .append(",\"hi\":").append(jsonDouble(c.fHi))
        sb.append('}')
      }
      sb.append("}}").toString
    }
  }

  private def jsonDouble(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString
    else "\"" + d.toString + "\"" // ±Infinity as quoted token

  def supportedType(dt: DataType): Boolean = kindOf(dt) != ' '

  private def kindOf(dt: DataType): Char = dt match {
    case LongType | IntegerType | ShortType | ByteType => 'i'
    case DoubleType | FloatType => 'f'
    case _ => ' '
  }

  /** Serialize one file's stats in the `_zonemap-*.json` line format
    * (the same shape [[Collector.toJsonLine]] emits) — used by
    * compaction to persist MERGED stats for a compacted file. */
  def statsJsonLine(fileName: String, fs: FileStats): String = {
    val sb = new StringBuilder
    sb.append("{\"file\":\"").append(fileName).append("\",\"rows\":")
      .append(fs.rows).append(",\"cols\":{")
    var first = true
    fs.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      if (!first) sb.append(',')
      first = false
      sb.append('"').append(name).append("\":{\"kind\":\"").append(c.kind)
        .append("\",\"nulls\":").append(c.nulls)
        .append(",\"nonNulls\":").append(c.nonNulls)
      if (c.kind == 'i')
        sb.append(",\"lo\":").append(c.iLo).append(",\"hi\":").append(c.iHi)
      else
        sb.append(",\"lo\":").append(jsonDouble(c.fLo))
          .append(",\"hi\":").append(jsonDouble(c.fHi))
      sb.append('}')
    }
    sb.append("}}").toString
  }

  // ---- read side -----------------------------------------------------

  /** Union of every `_zonemap-*.json` in the dir: file name → stats.
    * A malformed stats file disables pruning for its entries rather
    * than failing the scan (stats are an optimization, not truth). */
  def load(dir: String): Map[String, FileStats] = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.startsWith("_zonemap-") &&
        f.getName.endsWith(".json"))
    files.flatMap { f =>
      try {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().filter(_.nonEmpty).flatMap(parseLine).toList
        finally src.close()
      } catch { case _: Exception => Nil }
    }.toMap
  }

  private val factory = new JsonFactory()

  private[v2] def parseLine(line: String): Option[(String, FileStats)] =
    try {
      val p = factory.createParser(line)
      try parseLineWith(p)
      finally p.close()
    } catch { case _: Exception => None }

  private def parseLineWith(p: com.fasterxml.jackson.core.JsonParser)
      : Option[(String, FileStats)] = {
      var file: String = null
      var rows = 0L
      var cols = Map.empty[String, ColStats]
      if (p.nextToken() != JsonToken.START_OBJECT) return None
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        p.getCurrentName match {
          case "file" => p.nextToken(); file = p.getText
          case "rows" => p.nextToken(); rows = p.getLongValue
          case "cols" =>
            p.nextToken() // START_OBJECT
            while (p.nextToken() == JsonToken.FIELD_NAME) {
              val col = p.getCurrentName
              p.nextToken() // START_OBJECT
              var kind = ' '
              var nulls = 0L
              var nonNulls = 0L
              var iLo = 0L; var iHi = 0L
              var fLo = 0d; var fHi = 0d
              var loTok: Either[Long, Double] = Left(0L)
              var hiTok: Either[Long, Double] = Left(0L)
              while (p.nextToken() == JsonToken.FIELD_NAME) {
                val fn = p.getCurrentName
                p.nextToken()
                fn match {
                  case "kind" => kind = p.getText.charAt(0)
                  case "nulls" => nulls = p.getLongValue
                  case "nonNulls" => nonNulls = p.getLongValue
                  case "lo" => loTok =
                    if (p.getCurrentToken == JsonToken.VALUE_STRING)
                      Right(p.getText.toDouble)
                    else if (p.getCurrentToken == JsonToken.VALUE_NUMBER_INT)
                      Left(p.getLongValue)
                    else Right(p.getDoubleValue)
                  case "hi" => hiTok =
                    if (p.getCurrentToken == JsonToken.VALUE_STRING)
                      Right(p.getText.toDouble)
                    else if (p.getCurrentToken == JsonToken.VALUE_NUMBER_INT)
                      Left(p.getLongValue)
                    else Right(p.getDoubleValue)
                  case _ => p.skipChildren()
                }
              }
              if (kind == 'i') {
                iLo = loTok.fold(identity, _.toLong)
                iHi = hiTok.fold(identity, _.toLong)
              } else {
                fLo = loTok.fold(_.toDouble, identity)
                fHi = hiTok.fold(_.toDouble, identity)
              }
              cols += col -> ColStats(kind, iLo, iHi, fLo, fHi, nulls, nonNulls)
            }
          case _ => p.nextToken(); p.skipChildren()
        }
      }
      if (file == null) None else Some(file -> FileStats(rows, cols))
  }

  // ---- pruning -------------------------------------------------------

  /** True iff the file's stats PROVE `filter` matches no row. */
  def provesEmpty(fs: FileStats, filter: Filter): Boolean = filter match {
    case EqualTo(a, v) => outsideRange(fs, a, v, strictLo = true, strictHi = true)
    case GreaterThan(a, v) => allAtMost(fs, a, v) // every row <= v
    case GreaterThanOrEqual(a, v) => allBelow(fs, a, v)
    case LessThan(a, v) => allAtLeast(fs, a, v)
    case LessThanOrEqual(a, v) => allAbove(fs, a, v)
    case In(a, vs) => vs.nonEmpty &&
      vs.forall(v => outsideRange(fs, a, v, strictLo = true, strictHi = true))
    case IsNull(a) =>
      fs.cols.get(a).exists(c => c.nulls == 0L && c.nonNulls > 0L)
    case IsNotNull(a) =>
      fs.cols.get(a).exists(c => c.nonNulls == 0L && c.nulls > 0L)
    case And(l, r) => provesEmpty(fs, l) || provesEmpty(fs, r)
    case Or(l, r) => provesEmpty(fs, l) && provesEmpty(fs, r)
    case _ => false
  }

  // comparisons match a non-null row only; a stats row with nonNulls=0
  // can't satisfy one, and with no non-null range there is nothing to
  // compare — handled by the `nonNulls > 0` guards below.
  private def cmp(fs: FileStats, attr: String, v: Any)
      (onInt: (ColStats, Long) => Boolean)
      (onFrac: (ColStats, Double) => Boolean): Boolean =
    fs.cols.get(attr) match {
      case Some(c) if c.nonNulls == 0L => true // only nulls: no match
      case Some(c) if c.kind == 'i' => v match {
        case l: Long => onInt(c, l)
        case i: Int => onInt(c, i.toLong)
        case s: Short => onInt(c, s.toLong)
        case b: Byte => onInt(c, b.toLong)
        case _ => false // cross-kind comparison: never prune
      }
      case Some(c) if c.kind == 'f' => v match {
        case d: Double => !d.isNaN && onFrac(c, d)
        case f: Float => !f.isNaN && onFrac(c, f.toDouble)
        case _ => false
      }
      case _ => false // no stats for the column: never prune
    }

  private def outsideRange(fs: FileStats, a: String, v: Any,
      strictLo: Boolean, strictHi: Boolean): Boolean =
    cmp(fs, a, v)((c, l) => l < c.iLo || l > c.iHi)(
      (c, d) => d < c.fLo || d > c.fHi)

  private def allAtMost(fs: FileStats, a: String, v: Any): Boolean =
    cmp(fs, a, v)((c, l) => c.iHi <= l)((c, d) => c.fHi <= d)

  private def allBelow(fs: FileStats, a: String, v: Any): Boolean =
    cmp(fs, a, v)((c, l) => c.iHi < l)((c, d) => c.fHi < d)

  private def allAtLeast(fs: FileStats, a: String, v: Any): Boolean =
    cmp(fs, a, v)((c, l) => c.iLo >= l)((c, d) => c.fLo >= d)

  private def allAbove(fs: FileStats, a: String, v: Any): Boolean =
    cmp(fs, a, v)((c, l) => c.iLo > l)((c, d) => c.fLo > d)
}
