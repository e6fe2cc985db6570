package graft.operators

import graft.{Fx, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming execution surfaced in the oracle-checked
  * registry: the hourly event rollup runs as a REAL streaming query
  * (file source → watermark → windowed agg → memory sink,
  * Trigger.AvailableNow) and must produce exactly the batch answer —
  * the DuckDB oracle is the same SQL that checks the batch q16.
  */
object StreamingQueries {
  import Fx._

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  def q72(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    // the file stream source needs a DIRECTORY; point it at the sf dir
    // and glob-filter to the events file
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val events = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
    val agg = events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total_value"))
      .select($"window.start".as("hour"), $"event_type", $"n_events", $"total_value")
    val sink = s"q72_sink_${counter.incrementAndGet()}"
    val query = agg.writeStream
      .format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(300000)
    s.table(sink).orderBy($"hour", $"event_type")
  }

  val q72Sql: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       |count(*) AS n_events, ${sqlMoneySum("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q72_streaming_hourly", q72, Some(q72Sql)),
  )
}
