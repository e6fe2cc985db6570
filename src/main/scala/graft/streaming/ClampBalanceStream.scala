package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

final case class BalEvent(user: Long, ms: Long, event_id: Long, delta: Long)
final case class BalanceRow(user: Long, ms: Long, event_id: Long, balance: Long)

/** Streaming clamped running balance — the continuous twin of
  * `Accumulate.clampedRunningBalance` (q260): per-key bounded
  * accumulation `bal = min(max(bal + delta, lo), hi)` over an
  * out-of-order event stream. The recurrence is ORDER-dependent, so
  * arrival-order folding would be wrong under reordering; instead this
  * is an event-time-ordered fold gated by the watermark:
  *
  *  - arriving rows buffer in per-key ListState (never folded
  *    immediately);
  *  - one event-time timer per key sits at the newest buffered event;
  *  - when the watermark passes it, every buffered row at or below the
  *    watermark is SAFE to fold (with lateness δ, rows below the
  *    watermark can no longer arrive — the same contract every
  *    watermarked aggregation relies on): they sort by (ms, event_id),
  *    fold from the persisted balance, emit one balance row each, and
  *    leave the buffer.
  *
  * State per key = one long (the folded balance) + the buffer of
  * not-yet-finalized events — O(arrival rate × watermark lag), the
  * same horizon bound as q180's TTL argument, NOT O(stream). Emitted
  * rows are arrival-order invariant (any admissible arrival order
  * folds the same event-time order), which is what lets q262
  * hash-match the batch recursive-CTE oracle exactly.
  */
class ClampBalanceProcessor(lo: Long, hi: Long, z0: Long)
    extends StatefulProcessor[Long, BalEvent, BalanceRow] {

  @transient private var bal: ValueState[Long] = _
  @transient private var buf: ListState[BalEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    bal = getHandle.getValueState("bal", Encoders.scalaLong, TTLConfig.NONE)
    buf = getHandle.getListState("buf", Encoders.product[BalEvent], TTLConfig.NONE)
  }

  private def rearmTimer(): Unit = {
    var maxMs = Long.MinValue
    buf.get().foreach(e => if (e.ms > maxMs) maxMs = e.ms)
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    if (maxMs != Long.MinValue) getHandle.registerTimer(maxMs)
  }

  override def handleInputRows(key: Long, rows: Iterator[BalEvent],
      timerValues: TimerValues): Iterator[BalanceRow] = {
    rows.foreach(buf.appendValue)
    rearmTimer()
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[BalanceRow] = {
    val wm = timerValues.getCurrentWatermarkInMs()
    val all = scala.collection.mutable.ArrayBuffer.empty[BalEvent]
    buf.get().foreach(all += _)
    val (ready, pending) = all.partition(_.ms <= wm)
    val sorted = ready.sortBy(e => (e.ms, e.event_id))
    var b = if (bal.exists()) bal.get() else z0
    val out = sorted.map { e =>
      b = math.min(math.max(b + e.delta, lo), hi)
      BalanceRow(key, e.ms, e.event_id, b)
    }
    bal.update(b)
    buf.clear()
    pending.foreach(buf.appendValue)
    rearmTimer()
    out.iterator
  }
}

object ClampBalanceStream {

  def balances(events: Dataset[BalEvent], lo: Long, hi: Long, z0: Long,
      lateness: String = "0 seconds"): Dataset[BalanceRow] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_millis($"ms"))
      .withWatermark("ts", lateness)
      .as[BalEvent]
      .groupByKey(_.user)
      .transformWithState(new ClampBalanceProcessor(lo, hi, z0),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** AvailableNow run over the sf-dir events table: purchases add
    * their cent value, errors subtract theirs, balance clamped into
    * [0, 50000] from 0 — per-user bounded exposure, folded in
    * event-time order however the files arrive. Rows at or below the
    * final watermark (ms-truncated max ts, 0 s delay) are finalized —
    * with a single AvailableNow pass that is every row, which is
    * exactly what the q262 oracle folds. */
  def run(s: SparkSession, dir: String, sinkName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val raw = NearDupStream.streamParquetTable(s, dir, "events.parquet")
    val events = graft.Fx.eventTs(raw)
      .filter($"event_type".isin("purchase", "error"))
      .select($"user_id".as("user"),
        (unix_micros($"ts") / 1000L).cast("long").as("ms"),
        $"event_id",
        when($"event_type" === "purchase", floor($"value" * 100))
          .otherwise(-floor($"value" * 100)).cast("long").as("delta"))
      .as[BalEvent]
    val out = balances(events, lo = 0L, hi = 50000L, z0 = 0L)
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
      .select($"user".as("user_id"), $"ms", $"event_id", $"balance")
      .orderBy($"user_id", $"ms", $"event_id")
  }
}
