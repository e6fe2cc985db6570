package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source operators (SURVEY §2.1): schema-declared CSV glob reads,
  * JSON, JDBC with projection pushdown, pre-fetched page text.
  *
  * Scale notes: every reader takes an explicit schema (no inference
  * pass over 100 TB), globs resolve to partition-parallel scans, and
  * JDBC reads accept partitioning bounds so one executor isn't a
  * single-connection bottleneck.
  */
object Sources {

  /** S5/S8: CSV glob source with declared schema (no inference scan).
    * A star-glob over the daily dirs unions all files in one
    * partition-parallel read — the reference's per-file
    * read_csv+concat loop collapses into a single scan. */
  def csvGlob(spark: SparkSession, schema: StructType, path: String,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** CSV with a bad-record side channel: malformed rows land in
    * `_corrupt_record` instead of killing the job (the reference's
    * try/except-continue, §4 error isolation). */
  def csvPermissive(spark: SparkSession, schema: StructType, path: String): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read.schema(withCorrupt)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
  }

  /** S7: JSON-lines source with declared schema. */
  def jsonLines(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** S7 (API body variant): parse an in-memory JSON document the driver
    * fetched (the reference's requests.get().json()). */
  def jsonBody(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(body).toDS())
  }

  /** S6: JDBC table scan. Projection/predicates push down through the
    * JDBC source (vs the reference's string-assembled SELECT). For big
    * tables pass `partitionColumn/lowerBound/upperBound/numPartitions`
    * so the read parallelizes. */
  def jdbcTable(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties(),
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 1): DataFrame =
    (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        spark.read.jdbc(url, table, c, lo, hi, numPartitions, props)
      case _ => spark.read.jdbc(url, table, props)
    }

  /** S1 (zero-egress variant): pre-fetched HTML/text pages, one row per
    * file: (path, content). The scrape fetch loop becomes a distributed
    * scan over a page archive. */
  def pageArchive(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .withColumn("path", input_file_name())
      .withColumnRenamed("value", "content")
      .select(col("path"), col("content"))
}
