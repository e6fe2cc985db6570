package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-19 streaming diagnosis (guide §1): replicate the q72/q74
  * micro-batch pipelines with a handle on the StreamingQuery so the
  * per-trigger `durationMs` breakdown (addBatch / getBatch / walCommit
  * / stateOperators commit times) can be printed — the registry fns
  * hide the handle behind the DataFrame contract. Measurement only;
  * the registry queries themselves are untouched.
  *
  *   sbt 'runMain graft.StreamProfile /root/testdata/sf0.1'
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SP_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(tag: String, dedup: Boolean): Unit = {
      val schema = spark.read.parquet(s"$d/events.parquet").schema
      val raw = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val events = Fx.eventTs(raw)
      val out =
        if (dedup)
          events.withWatermark("ts", "2 hours")
            .dropDuplicates("user_id", "event_type")
            .select($"user_id", $"event_type")
        else
          events.withWatermark("ts", "2 hours")
            .groupBy(window($"ts", "1 hour"), $"event_type")
            .agg(count(lit(1)).as("n_events"),
              Fx.moneySum($"value").as("total_value"))
            .select($"window.start".as("hour"), $"event_type", $"n_events",
              $"total_value")
      val sink = s"sp_${tag}_${System.nanoTime()}"
      val t0 = System.nanoTime()
      val w0 = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow())
      val w = sys.env.get("SP_CKPT").fold(w0)(base =>
        w0.option("checkpointLocation", s"$base/ckpt_$sink"))
      val q = w.start()
      q.awaitTermination(300000)
      val wall = (System.nanoTime() - t0) / 1e6
      println(f"== $tag wall=${wall}%.0f ms, batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"    state: commitMs=${so.allUpdatesTimeMs}/" +
            s"${so.commitTimeMs} rowsTotal=${so.numRowsTotal} " +
            s"updated=${so.numRowsUpdated} mem=${so.memoryUsedBytes}")
        }
      }
    }
    // twice each: first includes source-listing/codegen warmup
    runOnce("q72cold", dedup = false)
    runOnce("q72warm", dedup = false)
    runOnce("q74cold", dedup = true)
    runOnce("q74warm", dedup = true)
    spark.stop()
  }
}
