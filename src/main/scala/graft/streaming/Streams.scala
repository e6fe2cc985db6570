package graft.streaming

import graft.operators.Cleaning
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming form of the reference's cron+append
  * incrementality (SURVEY §2.9): the daily scrape drop-dir becomes a
  * file-source stream processed with `Trigger.AvailableNow` (catch up
  * on all unseen files, then stop — exactly the scheduled-batch
  * semantics, but with checkpointed exactly-once file tracking instead
  * of blind re-append).
  */
object Streams {

  /** Daily ingest: watch a drop directory of raw listing CSVs, clean
    * with the SAME Cleaning pipeline as batch, sink to partitioned
    * parquet. One checkpoint dir == one exactly-once ingest ledger. */
  def dailyIngest(spark: SparkSession, srcDir: String, schema: StructType,
      outDir: String, checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", 64)
      .csv(srcDir)
      .transform(Cleaning.cleanListings)
      .writeStream
      .partitionBy("city", "date")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Late-data audit: total rows the watermark dropped across a
    * finished query's progress events (Spark reports this per state
    * operator, per micro-batch). An ingest SLA monitors exactly this
    * number — silently-dropped late data is the classic streaming
    * correctness leak, and at 100 TB/day even a 0.01% drop rate is
    * real data; alert on it, don't discover it in an audit. */
  def droppedByWatermark(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq.map(_.numRowsDroppedByWatermark)).sum

  /** Windowed event counts with a watermark: 1-hour tumbling windows,
    * 2-hour late-data tolerance. Works on any streaming events frame
    * with (ts, event_type, value). */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  final case class Event(user_id: Long, event_id: Long, tsMicros: Long)
  final case class SessionState(sessionCount: Int, lastTsMicros: Long)
  final case class UserSessions(user_id: Long, n_sessions: Int, n_events: Long)

  /** Stateful gap sessionization via mapGroupsWithState — the streaming
    * twin of EventQueries.q70 (30-min inactivity gap). State per user
    * is two numbers, so memory is O(active users), not O(events). */
  def sessionizeUpdate(
      key: Long, rows: Iterator[Event],
      state: GroupState[(Int, Long, Long)]): UserSessions = {
    val (c0, last0, n0) = state.getOption.getOrElse((0, Long.MinValue, 0L))
    val sorted = rows.toSeq.sortBy(e => (e.tsMicros, e.event_id))
    var count = c0
    var last = last0
    var n = n0
    sorted.foreach { e =>
      if (last == Long.MinValue || e.tsMicros - last > 1800L * 1000000L) count += 1
      last = e.tsMicros
      n += 1
    }
    state.update((count, last, n))
    UserSessions(key, count, n)
  }

  /** Streaming → JDBC via foreachBatch with batch-id idempotence.
    *
    * Spark's JDBC batch writer alone is at-least-once under retries
    * (a failed-then-retried micro-batch appends twice). The standard
    * exactly-once recipe: stamp every row with its micro-batch id,
    * and have each batch DELETE its own id before appending — a retry
    * (or a full re-run against a fresh checkpoint that replays the
    * same batch ids) replaces its rows instead of duplicating them.
    * The delete is one indexed statement per batch, not a scan. */
  def foreachBatchJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          val st = conn.createStatement()
          // Spark's JDBC writer passes the TABLE name through unquoted
          // (the database applies its own case folding) but quotes every
          // COLUMN name exactly — the delete must match both conventions.
          try st.executeUpdate(s"""DELETE FROM $table WHERE "batch_id" = $batchId""")
          catch {
            // swallow ONLY "table does not exist" (first-ever batch);
            // any other failure must fail the batch, not hide a dup
            case e: java.sql.SQLException
                if Option(e.getSQLState).exists(s => s == "42X05" || s == "42P01") => ()
          }
          finally st.close()
        } finally conn.close()
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").jdbc(url, table, props)
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()

  final case class TsEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class ClosedSession(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Streaming sessionization that emits only CLOSED sessions, via
    * flatMapGroupsWithState + event-time timeout: a session closes
    * either when a later event arrives past the gap (emitted in that
    * micro-batch) or when the WATERMARK passes last-event + gap (the
    * timeout path — no new event needed). State per user is one open
    * session (3 longs); output is append-safe because a closed session
    * never changes. This is the production shape of q70's batch
    * sessionization: emission is driven by event time, and state is
    * evicted by the same watermark that bounds lateness. */
  def sessionizeClosedUpdate(gapUs: Long)(
      key: Long, rows: Iterator[TsEvent],
      state: GroupState[(Long, Long, Long)]): Iterator[ClosedSession] = {
    if (!rows.hasNext && state.hasTimedOut) {
      // watermark passed the open session's gap → close and evict
      val (st, last, n) = state.get
      state.remove()
      return Iterator(ClosedSession(key, st, last, n))
    }
    // full-microsecond epoch (Timestamp.getTime is ms-truncated; the
    // sub-ms fraction lives in getNanos)
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val us = micros(e.ts)
      cur match {
        case Some((st, last, n)) if us - last > gapUs =>
          closed += ClosedSession(key, st, last, n)
          cur = Some((us, us, 1L))
        case Some((st, last, n)) =>
          cur = Some((st, math.max(last, us), n + 1L))
        case None =>
          cur = Some((us, us, 1L))
      }
    }
    cur.foreach { c =>
      state.update(c)
      // close via timeout when the watermark passes last + gap
      state.setTimeoutTimestamp(c._2 / 1000L + gapUs / 1000L)
    }
    closed.iterator
  }

  /** Streaming closed-session stream (append mode). `events` must carry
    * a watermark on `ts` before grouping. */
  def sessionizeClosed(events: org.apache.spark.sql.Dataset[TsEvent],
      gapMinutes: Int = 30): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sessionizeClosedUpdate(gapMinutes * 60L * 1000000L))
      .toDF()
  }

  def sessionize(events: org.apache.spark.sql.Dataset[Event]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(sessionizeUpdate)
      .toDF()
  }

  final case class ArrivingDoc(doc_id: Long, fp: String, lang: String)

  /** Cross-batch content dedup for CONTINUOUS corpus ingestion: only
    * the first arrival of each content fingerprint is ever emitted —
    * within a micro-batch (smallest doc_id wins, deterministic) and
    * across all later batches (state remembers the fingerprint). This
    * is the streaming twin of `Dedup.exactDedup`: a batch re-dedup of
    * the accumulated corpus re-reads everything ingested so far; the
    * stateful form pays O(new docs) per batch with O(distinct
    * fingerprints) state. At 100 TB the fingerprint is the only thing
    * held — 32 bytes a doc — and a TTL timeout can bound it when the
    * dedup horizon is finite. */
  def dedupOnArrivalUpdate(
      key: String, rows: Iterator[ArrivingDoc],
      state: GroupState[Long]): Iterator[ArrivingDoc] = {
    if (!rows.hasNext) Iterator.empty
    else if (state.exists) Iterator.empty
    else {
      val first = rows.minBy(_.doc_id)
      state.update(first.doc_id)
      Iterator(first)
    }
  }

  /** Append-mode stream of first-arrival docs, keyed by fingerprint. */
  def dedupOnArrival(docs: org.apache.spark.sql.Dataset[ArrivingDoc]): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.fp)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(dedupOnArrivalUpdate)
      .toDF()
  }

  final case class BucketSummary(bucket: Int, item: String, cnt: Long)

  /** Streaming frequent items: per-bucket Misra-Gries summaries held in
    * flatMapGroupsWithState. Items hash-route to `buckets` groups, each
    * group folds its slice of the stream into a ≤ k-counter
    * [[graft.plans.MgBuffer]] (state is the serialized counter map —
    * bounded at k entries per bucket FOREVER, however long the stream
    * runs), and every trigger re-emits the updated buckets' summaries
    * (Update mode). Global heavy hitters = merge of the bucket
    * summaries downstream; because routing is deterministic by item,
    * each item's whole count lives in exactly one bucket, so in the
    * exact regime (k ≥ bucket vocabulary) the union IS the exact count
    * table — which is what StreamingSpec pins against a batch groupBy.
    */
  def frequentItemsUpdate(k: Int)(
      bucket: Int, rows: Iterator[String],
      state: GroupState[Map[String, Long]]): Iterator[BucketSummary] = {
    val buf = new graft.plans.MgBuffer(k)
    state.getOption.getOrElse(Map.empty)
      .foreach { case (item, c) => buf.counters.put(item, c) }
    rows.foreach(buf.add(_))
    import scala.jdk.CollectionConverters._
    val out = buf.counters.asScala.toMap
    state.update(out)
    out.iterator.map { case (item, c) => BucketSummary(bucket, item, c) }
  }

  /** Update-mode stream of per-bucket MG summaries. */
  def frequentItems(items: org.apache.spark.sql.Dataset[String],
      k: Int, buckets: Int): DataFrame = {
    import items.sparkSession.implicits._
    items
      .groupByKey(s => math.floorMod(s.hashCode, buckets))
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(frequentItemsUpdate(k))
      .toDF()
  }

  final case class KeyedValue(key: String, value: Double)
  final case class QuantileSummary(key: String, n: Long, p50: Double, p99: Double)

  /** Streaming percentile monitor: per-key quantile sketch maintained
    * forever across micro-batches (latency/size SLO dashboards). State
    * per key is the serialized compactor stack — ≤ k·log₂(n/k)
    * doubles however long the stream runs, the same bound the batch
    * aggregate gives each partial. Each trigger re-emits the keys it
    * touched with their current p50/p99. */
  def quantileMonitorUpdate(k: Int)(
      key: String, rows: Iterator[KeyedValue],
      state: GroupState[Array[Byte]]): Iterator[QuantileSummary] = {
    val buf = state.getOption.map(graft.plans.QkCodec.read)
      .getOrElse(new graft.plans.QkBuffer(k))
    rows.foreach(r => buf.add(r.value))
    state.update(graft.plans.QkCodec.write(buf))
    val qs = buf.quantiles(Array(0.5, 0.99))
    Iterator.single(QuantileSummary(key, buf.count, qs(0), qs(1)))
  }

  /** Update-mode stream of per-key quantile summaries. */
  def quantileMonitor(values: org.apache.spark.sql.Dataset[KeyedValue],
      k: Int): DataFrame = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(quantileMonitorUpdate(k))
      .toDF()
  }
}
