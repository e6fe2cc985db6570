package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

final case class SessionEvent(user: String, ts: java.sql.Timestamp)

final case class ClosedSession(user: String, start_ms: Long, end_ms: Long,
    n_events: Long)

/** Gap-based sessionization with EVENT-TIME TIMERS on Spark 4's
  * transformWithState: per-user ValueState accumulates (start, end,
  * count); each batch re-arms a single timer at lastEvent + gap, and
  * the session is emitted by [[handleExpiredTimer]] when the WATERMARK
  * passes that instant — not when a new event for the same user
  * happens to arrive (the weakness of the flatMapGroupsWithState
  * timeout variant, Streams.q79 shape: a quiet user's session there
  * stays open until the engine happens to revisit the key; a timer is
  * a first-class per-key alarm the state store indexes and fires
  * deterministically).
  *
  * Scale: state is one (3×long) per OPEN session; closed sessions
  * leave the store immediately. Timers are indexed by the RocksDB
  * provider, so firing is O(expired), not O(keys).
  */
class TimerSessionProcessor(gapMs: Long)
    extends StatefulProcessor[String, SessionEvent, ClosedSession] {

  @transient private var sess: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState("sess",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[SessionEvent],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    // sort the batch slice: file-scan arrival order is arbitrary, the
    // gap split is defined on event-time (ms) order
    val times = rows.map(_.ts.getTime).toArray
    java.util.Arrays.sort(times)
    var (start, end, n) =
      if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    times.foreach { t =>
      if (n > 0 && t - end > gapMs) {
        // a later event of the SAME user proves the gap — the session
        // is closed by data, no need to wait for the watermark
        out += ClosedSession(key, start, end, n)
        start = t; end = t; n = 1
      } else if (n > 0 && start - t > gapMs) {
        // out-of-order arrival (possible only with lateness > 0) that
        // can't belong to the open session: emit it as its own closed
        // session rather than merging across a gap. Under late data the
        // session COUNT may over-split vs a full event-time sort, but
        // the gap INVARIANT (no intra-session gap > gapMs) always
        // holds; with the 0-second default this branch is unreachable.
        out += ClosedSession(key, t, t, 1)
      } else {
        start = math.min(start, t); end = math.max(end, t); n += 1
      }
    }
    sess.update((start, end, n))
    // exactly one live timer per key: re-arm to the newest event + gap
    getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
    getHandle.registerTimer(end + gapMs)
    out.iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
    if (!sess.exists()) Iterator.empty
    else {
      val (s0, e0, n) = sess.get()
      sess.clear()
      Iterator.single(ClosedSession(key, s0, e0, n))
    }
  }
}

object TwsSessions {

  /** Append-mode stream of CLOSED sessions. Requires the RocksDB state
    * store provider (see NearDupStream.RocksProvider). The watermark
    * delay is the lateness budget: a timer fires only once the
    * watermark (min event time across the last batch minus delay)
    * passes session end + gap.
    *
    * Semantics vs lateness: with the 0-second default, event time is
    * monotone across batches per key and the emitted sessions equal
    * the full event-time gap split EXACTLY (what q191's oracle pins).
    * With lateness > 0, out-of-order arrivals may over-split (an
    * early-but-valid event that can't join the open session closes as
    * its own singleton) — the gap invariant still holds for every
    * emitted session, but session counts can exceed the batch split. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
      lateness: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** AvailableNow run over the sf-dir events table → all sessions that
    * CLOSED: split in-batch by a data-proven gap, or fired by the
    * event-time timer once the final watermark passed end + gap. Each
    * user's trailing session stays open (in RocksDB) unless the
    * watermark reached it — exactly the rows the SQL mirror's
    * watermark gate reproduces. */
  def run(s: org.apache.spark.sql.SparkSession, dir: String, sinkName: String,
      gapMs: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val raw = NearDupStream.streamParquetTable(s, dir, "events.parquet")
    val tsed = graft.Fx.eventTs(raw)
    val events = tsed
      .select($"user_id".cast("string").as("user"), $"ts")
      .as[SessionEvent]
    val closed = sessionize(events, gapMs)
    NearDupStream.withRocksProvider(s) {
      val q = closed.writeStream.format("memory").queryName(sinkName)
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
      .select($"user".cast("long").as("user_id"), $"start_ms", $"end_ms",
        $"n_events")
      .orderBy($"user_id", $"start_ms")
  }
}
