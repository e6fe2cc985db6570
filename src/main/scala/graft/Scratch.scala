package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 ad-hoc piece-wise timing (guide §1.1 empirical loop):
  * decompose the expensive bench queries into stages and time each
  * variant through the noop sink to find where the wall time actually
  * goes. Throwaway measurement harness — results land in
  * OPTIMIZATION_r19.md; nothing here is part of the engine.
  */
object Scratch {
  def time(tag: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"SCRATCH $tag%-44s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val md5f = graft.plans.GraftFunctions.md5_fast _

    val W = 8
    def docsW = Tables.documents(spark, d)
      .select($"doc_id", split($"text", " ").as("w"))

    // q140 decomposition
    def winsBase(distinct: Boolean, hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val t = transform(sequence(lit(1), size($"w") - (W - 1)),
        i => array_join(slice($"w", i, lit(W)), " "))
      docsW.select($"doc_id", explode(
        when(size($"w") >= W, if (distinct) array_distinct(t) else t)
          .otherwise(array().cast("array<string>"))).as("win"))
        .withColumn("h", hash($"win"))
    }
    def aggTop(wins: DataFrame) = wins.groupBy($"h")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"),
        min($"win").as("window"))
      .filter($"n_docs" >= 2)
      .orderBy($"n_docs".desc, $"h").limit(30)

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("q140 split only")(noop(docsW))
      time("q140 windows, nodistinct, nohash")(noop(winsBase(distinct = false, c => lit(1))))
      time("q140 windows, distinct, nohash")(noop(winsBase(distinct = true, c => lit(1))))
      time("q140 windows, distinct, xx64")(noop(winsBase(distinct = true, c => xxhash64(c))))
      time("q140 windows, distinct, md5fast")(noop(winsBase(distinct = true, md5f)))
      time("q140 full (current impl)")(noop(operators.TrainingQueries.q140(spark, d)))
      time("q140 full agg w/ md5fast")(noop(aggTop(winsBase(distinct = true, md5f))))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
