package graft.sources.v2

import java.util

import graft.sources.ListingParser
import graft.sources.ListingParser.RawListing
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the listing-page archive: the scrape
  * source (SURVEY §2.1 S1-S4) as a first-class Spark TABLE instead of
  * a flatMap pipeline — `spark.read.format(<this class>)
  * .option("path", dir).option("date", d).load()`.
  *
  * What V2 buys over the flatMap form:
  *  - **column pruning at the source** (SupportsPushDownRequiredColumns):
  *    `select(city)` materializes one string per row, not 14;
  *  - **predicate pushdown** (SupportsPushDownFilters): string-equality
  *    filters (city/state/name) are evaluated inside the reader against
  *    parsed fields and REMOVED from the Spark plan — no residual
  *    FilterExec, rows that fail never reach the engine;
  *  - **partition planning**: one input partition per archive page, so
  *    a 1M-page archive parses with full cluster parallelism and
  *    locality hooks, not whole-directory text-scan heuristics.
  *
  * Parse semantics are exactly [[ListingParser.parseFloorPlans]]
  * (malformed page → zero rows), so V2SourceSpec can assert row parity
  * with the flatMap path.
  */
class ListingDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ListingDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "listing source requires .option(\"path\", <archive dir>)")
    new ListingTable(path, Option(properties.get("date")).getOrElse(""))
  }
}

object ListingDataSource {
  val fieldNames: Seq[String] = Seq(
    "name", "address", "unit", "sqft", "bed", "bath", "price",
    "city", "state", "zipcode", "description", "details", "url", "date")

  val schema: StructType =
    StructType(fieldNames.map(f => StructField(f, StringType, nullable = false)))

  private[v2] def fieldValue(r: RawListing, f: String): String = f match {
    case "name" => r.name
    case "address" => r.address
    case "unit" => r.unit
    case "sqft" => r.sqft
    case "bed" => r.bed
    case "bath" => r.bath
    case "price" => r.price
    case "city" => r.city
    case "state" => r.state
    case "zipcode" => r.zipcode
    case "description" => r.description
    case "details" => r.details
    case "url" => r.url
    case "date" => r.date
    case other => throw new IllegalArgumentException(s"no field $other")
  }
}

private[v2] class ListingTable(path: String, date: String)
  extends Table with SupportsRead {
  override def name(): String = s"listings($path)"
  override def schema(): StructType = ListingDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ListingScanBuilder(path, date)
}

private[v2] class ListingScanBuilder(path: String, date: String)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = ListingDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  /** Accept string-equality on parsed page fields; everything else
    * stays in the Spark plan. Returning only the remainder tells
    * Catalyst the accepted filters need NO residual FilterExec. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo(attr, _: String) =>
        Seq("city", "state", "name").contains(attr)
      case _ => false
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ListingScan(path, date, required, pushed)
}

private[v2] class ListingScan(path: String, date: String,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ListingScan path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  /** List the archive through the Hadoop FileSystem API so any
    * configured scheme works (file://, hdfs://, s3a://, ...), not just
    * the driver's local filesystem. */
  override def planInputPartitions(): Array[InputPartition] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val fs = hp.getFileSystem(conf)
    val files =
      if (!fs.exists(hp)) Array.empty[String]
      else fs.listStatus(hp).filter(_.isFile)
        .map(_.getPath.toString).sorted
    files.map(f => ListingInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ListingReaderFactory(date, required.fieldNames,
      pushed.collect { case EqualTo(a, v: String) => (a, v) })
}

private[v2] case class ListingInputPartition(file: String) extends InputPartition

private[v2] class ListingReaderFactory(date: String, fields: Array[String],
    eqFilters: Array[(String, String)]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[ListingInputPartition].file
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        // Hadoop FS read: partition paths are URIs from the driver's
        // listing (file:/, hdfs://, ...); malformed/unreadable page →
        // zero rows, matching the flatMap path's semantics.
        val content =
          try {
            val hp = new org.apache.hadoop.fs.Path(file)
            val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
            val in = fs.open(hp)
            try {
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](64 * 1024)
              var n = in.read(buf)
              while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
              new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
            } finally in.close()
          } catch { case _: Exception => "" }
        ListingParser.parseFloorPlans(content, file, date).iterator
          .filter(r => eqFilters.forall { case (a, v) =>
            ListingDataSource.fieldValue(r, a) == v })
          .map(r => InternalRow.fromSeq(fields.toSeq.map(f =>
            UTF8String.fromString(ListingDataSource.fieldValue(r, f)))))
      }
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
