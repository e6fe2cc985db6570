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
    var (start, end, n) =
      if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
    rows.foreach { e =>
      val t = e.ts.getTime
      start = math.min(start, t); end = math.max(end, t); n += 1
    }
    sess.update((start, end, n))
    // exactly one live timer per key: re-arm to the newest event + gap
    getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
    getHandle.registerTimer(end + gapMs)
    Iterator.empty
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
    * passes session end + gap. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
      lateness: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
