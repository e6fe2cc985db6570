package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming CUSUM control chart — the continuous twin of q320's
  * batch chart, monitoring per-purchase value as events arrive. The
  * production protocol is calibrate-then-monitor: the reference
  * (truncating mean μ), allowance (k = mad div 2) and threshold
  * (h = 5·mad) are fixed integers computed from a batch pass BEFORE
  * the stream starts (a live chart cannot use the retrospective mean
  * q320 is allowed), and the one-sided clamped recurrences
  *
  *   S⁺ = max(0, S⁺ + (x − μ − k)),  S⁻ = max(0, S⁻ + (μ − x − k))
  *
  * ride the SAME event-time-ordered fold as q262 —
  * [[ClampBalanceProcessor]] with lo = 0 and an unreachable upper
  * clamp, keyed by chart side (2 keys), rows buffered in ListState
  * and folded only when the watermark passes them. Emitted rows are
  * arrival-order invariant, which is what lets the oracle state the
  * recurrence as a recursive CTE over (ts, event_id) order and
  * hash-match exactly.
  *
  * State per key = one long + the watermark-lag-bounded buffer;
  * alarm rows are flagged against the pre-computed h.
  */
object CusumStream {

  def run(s: SparkSession, dir: String, sinkName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    // calibration pass (batch): integer μ, mad over the purchase cents
    val cal = graft.Fx.eventTs(graft.Tables.events(s, dir))
      .filter($"event_type" === "purchase")
      .select(floor($"value" * 100).cast("long").as("x"))
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"))
      .select(expr("sx div n").as("mu"), $"n")
      .head()
    val mu = cal.getLong(0)
    val mad = graft.Fx.eventTs(graft.Tables.events(s, dir))
      .filter($"event_type" === "purchase")
      .select(floor($"value" * 100).cast("long").as("x"))
      .agg(expr(s"sum(abs(x - $mu)) div count(1)").as("mad"))
      .head().getLong(0)
    val k = mad / 2
    val h = 5L * mad

    val raw = NearDupStream.streamParquetTable(s, dir, "events.parquet")
    val events = graft.Fx.eventTs(raw)
      .filter($"event_type" === "purchase")
      .withColumn("x", floor($"value" * 100).cast("long"))
      .select(explode(array(
        struct(lit(0L).as("user"),
          expr("unix_micros(ts) div 1000").as("ms"),
          $"event_id", ($"x" - mu - k).as("delta")),
        struct(lit(1L).as("user"),
          expr("unix_micros(ts) div 1000").as("ms"),
          $"event_id", (lit(mu) - $"x" - k).as("delta")))).as("e"))
      .select($"e.user", $"e.ms", $"e.event_id", $"e.delta")
      .as[BalEvent]
    val out = ClampBalanceStream.balances(events, lo = 0L,
      hi = Long.MaxValue / 4, z0 = 0L)
    NearDupStream.withRocksProvider(s) {
      val q = out.writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException(
          s"$sinkName: AvailableNow trigger did not complete in 300s")
      }
    }
    s.table(sinkName)
      .select(when($"user" === 0L, "up").otherwise("down").as("side"),
        $"ms", $"event_id", $"balance".as("cusum"),
        ($"balance" > h).cast("int").as("alarm"))
      .orderBy($"side", $"ms", $"event_id")
  }
}
