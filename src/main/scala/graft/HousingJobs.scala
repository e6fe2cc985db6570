package graft

import graft.operators.Cleaning
import graft.sources.{ListingParser, Sinks, Sources}
import graft.ml.PriceModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's three entry points as engine jobs — what a user of
  * datapointchris/etl-housing runs today, expressed as composed library
  * calls (SURVEY §3 lifecycles):
  *
  *  1. `scrapeDay`   — trulia_scrape.py main(): pages → rows → clean →
  *                     partitioned daily sink (idempotent re-run).
  *  2. `analyze`     — trulia_csv_to_nlp.ipynb: daily CSV union →
  *                     amenity flags → one-hot → ridge CV model.
  *  3. `sqlRoundTrip`— load_save_sql.ipynb: JDBC pull → union → append.
  */
object HousingJobs {

  /** Lifecycle 1: one day's ingest from a pre-fetched page archive.
    * Returns the cleaned frame (already written). */
  def scrapeDay(spark: SparkSession, pageDir: String, outDir: String,
      date: String): DataFrame = {
    val pages = Sources.pageArchive(spark, pageDir)
    val raw = ListingParser.parsePages(pages, date)
      .selectExpr(Cleaning.rawColumns: _*)
    val cleaned = Cleaning.cleanListings(raw)
    Sinks.overwriteDailyPartitions(cleaned, outDir)
    cleaned
  }

  /** Lifecycle 2: multi-day analysis — union the daily store, NLP
    * featurization, one-hot zips, ridge price model with 5-fold CV.
    * Returns (featurized frame, heldout R², coefficient table). */
  def analyze(spark: SparkSession, dailyDir: String,
      alphas: Seq[Double] = Seq(0.1, 1.0, 10.0))
      : (DataFrame, Double, Seq[(String, Double)]) = {
    val corpus = spark.read.parquet(dailyDir)
    val flagged = Cleaning.amenityFlags(
      corpus.withColumn("details", coalesce(col("details"), lit(""))), "details")
    val zips = flagged.select(col("zipcode").cast("string"))
      .filter(col("zipcode").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val featurized = Cleaning.oneHot(
      flagged.withColumn("zipcode", col("zipcode").cast("string")),
      "zipcode", zips, "zipcode")
      .filter(col("price").isNotNull && col("sqft").isNotNull)
      .na.fill(0.0, Seq("bed", "bath"))
    val featureCols = Seq("sqft", "bed", "bath") ++
      Cleaning.amenityKeywords ++
      zips.drop(1).map(z => s"zipcode_$z")
    val doubled = featureCols.foldLeft(featurized)((d, c) =>
      d.withColumn(c, col(c).cast("double")))
      .withColumn("price", col("price").cast("double"))
    val (train, test) = PriceModel.split(doubled)
    val model = PriceModel.crossValidate(train, featureCols, alphas)
    val r2 = PriceModel.r2(model, test)
    (featurized, r2, PriceModel.coefficients(model, featureCols))
  }

  /** Lifecycle 3: SQL round trip — pull two projections, union, append
    * back (surrogate key dropped). Returns the row count appended. */
  def sqlRoundTrip(spark: SparkSession, url: String, table: String,
      outTable: String, props: java.util.Properties): Long = {
    val full = Sources.jdbcTable(spark, url, table, props)
    val a = full.select("name", "price", "city")
    val b = full.select("name", "price", "city")
    val unioned = a.union(b)
    Sinks.jdbcAppend(unioned, url, outTable, dropCols = Seq.empty, props = props)
    unioned.count()
  }
}
