package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form (the streaming variants live in
  * graft.streaming and share the same column logic — `Trigger
  * .AvailableNow` over the same source gives identical results).
  */
object EventQueries {

  /** Gap-based sessionization (30-min inactivity): per-user session
    * counts. Timestamps compared at µs precision on both engines. */
  def q70(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"ts", unix_micros($"ts").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || $"us" - $"prev_us" > 1800L * 1000000L, 1).otherwise(0))
      .groupBy($"user_id")
      .agg(sum($"new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  val q70Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |g AS (
      |  SELECT user_id,
      |    lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us, us
      |  FROM e),
      |s AS (
      |  SELECT user_id,
      |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM g)
      |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q70_sessionize", q70, Some(q70Sql), bench = true),
  )
}
