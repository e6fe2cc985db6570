package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink operators (SURVEY §2.2): partitioned CSV/parquet, flat CSV,
  * JDBC append, JSON-lines, idempotent partition overwrite.
  */
object Sinks {

  /** K1: daily partitioned sink (`daily_scrape/{city}/{date}.csv` →
    * `dir/city=…/date=…/part-*.csv`). */
  def partitionedCsv(df: DataFrame, dir: String,
      partitions: Seq[String] = Seq("city", "date")): Unit =
    df.write.partitionBy(partitions: _*)
      .mode("append").option("header", "true").csv(dir)

  /** K1 (engine-native): parquet variant of the daily sink. */
  def partitionedParquet(df: DataFrame, dir: String,
      partitions: Seq[String] = Seq("city", "date")): Unit =
    df.write.partitionBy(partitions: _*).mode("append").parquet(dir)

  /** §4 idempotent re-run: overwrite ONLY the partitions present in
    * this batch (dynamic partition overwrite) — re-running a day's
    * ingest replaces that day instead of duplicating it (the
    * reference's blind `if_exists='append'` dup-risk, fixed). */
  def overwriteDailyPartitions(df: DataFrame, dir: String,
      partitions: Seq[String] = Seq("city", "date")): Unit =
    df.write.partitionBy(partitions: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(dir)

  /** K2: single flat CSV (tiny parity outputs only — coalesce(1)). */
  def flatCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** K3: JDBC append, surrogate key dropped (load_save_sql.ipynb:228). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      dropCols: Seq[String] = Seq("apt_id"),
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.drop(dropCols: _*).write.mode("append").jdbc(url, table, props)

  /** K4/K5: Mongo-document-shaped sink → JSON lines (zero-egress env;
    * each row becomes one document object). */
  def jsonLines(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  /** Bucketed sink for co-located joins at scale: pre-shuffles by the
    * join key once at write time so repeated downstream joins on that
    * key skip their shuffle (requires saveAsTable / metastore). */
  def bucketedTable(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key).mode("overwrite")
      .format("parquet").saveAsTable(table)
}
