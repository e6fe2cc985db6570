package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout
  * (`TESTDATA.md`): one parquet file per table under an sf dir.
  *
  * Scale notes: these are plain `spark.read.parquet` scans so Catalyst
  * predicate pushdown / column pruning / partition pruning apply
  * unchanged when the same code points at a partitioned 100 TB table
  * directory instead of a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` as INT64 TIMESTAMP(NANOS) (reads
    * as long under `legacy.parquet.nanosAsLong`) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as
    * TIMESTAMP_NTZ). `Fx.eventTs` normalizes every flavor to
    * TimestampType so `unix_micros`/watermark consumers never see the
    * encoding.
    */
  def events(s: SparkSession, d: String): DataFrame =
    Fx.eventTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
