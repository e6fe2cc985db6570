package graft.operators

import graft.{Fx, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming execution surfaced in the oracle-checked
  * registry: the hourly event rollup runs as a REAL streaming query
  * (file source → watermark → windowed agg → memory sink,
  * Trigger.AvailableNow) in APPEND mode, so the 2-hour watermark
  * actually evicts state: a window row is emitted exactly once, when
  * the watermark passes its end; windows the watermark never reaches
  * are withheld. The DuckDB oracle reproduces that semantics exactly —
  * the batch q16 aggregation gated by the same watermark cutoff
  * (max event time, ms precision, minus 2 hours).
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
    val events = graft.Fx.eventTs(raw)
    val agg = events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total_value"))
      .select($"window.start".as("hour"), $"event_type", $"n_events", $"total_value")
    val sink = s"q72_sink_${counter.incrementAndGet()}"
    val query = agg.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    // fail loudly on a hung trigger: a timed-out AvailableNow run would
    // otherwise read a silently-incomplete sink table
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q72: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).orderBy($"hour", $"event_type")
  }

  /** Batch q16 gated by the append-mode watermark: Spark tracks event
    * time at ms precision, so the cutoff is ms-truncated max(ts) minus
    * the 2-hour delay, and only windows whose END the watermark reached
    * were emitted. */
  val q72Sql: String =
    s"""WITH wm AS (
       |  SELECT date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP)))
       |         - INTERVAL 2 HOUR AS w
       |  FROM events)
       |SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       |count(*) AS n_events, ${sqlMoneySum("value")} AS total_value
       |FROM events, wm
       |WHERE date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR <= wm.w
       |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Streaming stateful dedup: first sighting of each (user_id,
    * event_type) key across the stream, with the watermark bounding
    * how long per-key state is retained. Only the KEY columns are
    * emitted — which payload row `dropDuplicates` keeps is
    * arrival-order-dependent (nondeterministic under a parallel file
    * scan), but the key set itself is exact, so the query stays
    * hash-checkable against batch DISTINCT. */
  def q74(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val events = graft.Fx.eventTs(raw)
    // r19: project BEFORE the stateful dedup (guide §2.3). Only the key
    // columns are ever emitted, but dropDuplicates shuffles and stores
    // the ENTIRE row it keeps — so without this projection every
    // payload column crosses the exchange into the state store for
    // nothing. Same emitted key set, skinnier shuffle + state rows.
    val deduped = events
      .select($"ts", $"user_id", $"event_type")
      .withWatermark("ts", "2 hours")
      .dropDuplicates("user_id", "event_type")
      .select($"user_id", $"event_type")
    val sink = s"q74_sink_${counter.incrementAndGet()}"
    val query = deduped.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q74: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).orderBy($"user_id", $"event_type")
  }

  val q74Sql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** Stream-static join: the event stream enriches against the static
    * customer dimension (broadcast — the standard streaming-enrichment
    * shape; the static side is planned per micro-batch, never stated),
    * then a watermarked hourly rollup per market segment in append
    * mode. */
  def q75(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val events = graft.Fx.eventTs(raw)
    val dim = broadcast(graft.Tables.load(s, d, "customer")
      .select($"c_custkey", $"c_mktsegment"))
    val agg = events
      .withWatermark("ts", "2 hours")
      .join(dim, events("user_id") === dim("c_custkey"))
      .groupBy(window($"ts", "1 hour"), $"c_mktsegment")
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total_value"))
      .select($"window.start".as("hour"), $"c_mktsegment", $"n_events", $"total_value")
    val sink = s"q75_sink_${counter.incrementAndGet()}"
    val query = agg.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q75: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).orderBy($"hour", $"c_mktsegment")
  }

  /** Batch twin: inner join + hourly rollup gated by the same
    * append-mode watermark cutoff as q72. */
  val q75Sql: String =
    s"""WITH wm AS (
       |  SELECT date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP)))
       |         - INTERVAL 2 HOUR AS w
       |  FROM events)
       |SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, c_mktsegment,
       |count(*) AS n_events, ${sqlMoneySum("value")} AS total_value
       |FROM events JOIN customer ON user_id = c_custkey, wm
       |WHERE date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR <= wm.w
       |GROUP BY 1, 2 ORDER BY hour, c_mktsegment""".stripMargin

  /** Streaming closed-session emission (flatMapGroupsWithState +
    * event-time timeout, see Streams.sessionizeClosed). In a single
    * AvailableNow batch every session with a SUCCESSOR session closes
    * in-batch; each user's final session stays open in state (its
    * timeout fires only when a later batch advances the watermark) —
    * so the emitted set is exactly "all gap-sessions except each
    * user's last", which the batch oracle reproduces. */
  def q79(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val events = graft.Fx.eventTs(raw)
    val evs = events.select($"user_id", $"event_id", $"ts")
      .withWatermark("ts", "2 hours")
      .as[graft.streaming.Streams.TsEvent]
    val closed = graft.streaming.Streams.sessionizeClosed(evs, gapMinutes = 30)
    val sink = s"q79_sink_${counter.incrementAndGet()}"
    val query = closed.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q79: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).orderBy($"user_id", $"start_us")
  }

  /** Batch twin: 30-min gap sessions per user (q70's session logic with
    * per-session bounds). A session is emitted if it has a successor
    * (closed in-batch) OR its gap expired before the final watermark —
    * AvailableNow runs one extra no-data batch after the file, firing
    * event-time timeouts against watermark = ms-truncated max(ts) minus
    * the 2-hour delay. */
  val q79Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_id, us,
      |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
      |  FROM e),
      |s AS (
      |  SELECT user_id, us,
      |    sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM g),
      |sess AS (
      |  SELECT user_id, sess_id, min(us) AS start_us, max(us) AS end_us,
      |    count(*) AS n_events
      |  FROM s GROUP BY user_id, sess_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY sess_id DESC) AS rn
      |  FROM sess),
      |wm AS (
      |  SELECT epoch_us(date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP))))
      |         - 7200000000 AS wus
      |  FROM events)
      |SELECT user_id, start_us, end_us, CAST(n_events AS BIGINT) AS n_events
      |FROM ranked, wm WHERE rn > 1 OR end_us + 1800000000 <= wus
      |ORDER BY user_id, start_us""".stripMargin

  /** SLIDING windows (1-hour window, 30-minute slide): every event
    * lands in two overlapping windows; append mode emits a window only
    * once the watermark passes its end. */
  def q82(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val events = graft.Fx.eventTs(raw)
    val agg = events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("total_value"))
      .select($"window.start".as("wstart"), $"event_type", $"n_events", $"total_value")
    val sink = s"q82_sink_${counter.incrementAndGet()}"
    val query = agg.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q82: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).orderBy($"wstart", $"event_type")
  }

  /** Batch twin: each event assigned to its two 30-min-grid windows
    * (time_bucket and time_bucket minus one slide), watermark-gated on
    * window END like q72. */
  val q82Sql: String =
    s"""WITH e AS (
       |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
       |wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 2 HOUR AS w FROM e),
       |slid AS (
       |  SELECT ts, event_type, value,
       |    time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE * off AS wstart
       |  FROM e, unnest([0, 1]) AS t(off))
       |SELECT wstart, event_type, count(*) AS n_events,
       |  ${sqlMoneySum("value")} AS total_value
       |FROM slid, wm
       |WHERE wstart + INTERVAL 1 HOUR <= wm.w
       |GROUP BY wstart, event_type ORDER BY wstart, event_type""".stripMargin

  /** STREAM-STREAM inner join: purchases matched to same-user views
    * within the following hour. Both sides carry watermarks and the
    * join condition bounds event-time distance, so per-key state is
    * evicted once the watermark passes the window — the storefront
    * attribution join at 100 TB/day scale. Inner-join matches emit as
    * found, so a single AvailableNow pass equals the batch join. */
  def q88(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    def stream() = {
      val raw = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      graft.Fx.eventTs(raw)
    }
    val views = stream().filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("v_user"), $"ts".as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val buys = stream().filter($"event_type" === "purchase")
      .select($"event_id".as("buy_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
      .withWatermark("b_ts", "2 hours")
    val joined = views.join(buys,
      expr("v_user = b_user AND b_ts >= v_ts AND b_ts <= v_ts + interval 1 hour"))
      .select($"view_id", $"buy_id", $"v_user".as("user_id"))
    val sink = s"q88_sink_${counter.incrementAndGet()}"
    val query = joined.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q88: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).orderBy($"view_id", $"buy_id")
  }

  val q88Sql: String =
    """SELECT v.event_id AS view_id, p.event_id AS buy_id, v.user_id
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
      | AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 1 HOUR
      |ORDER BY view_id, buy_id""".stripMargin

  /** q145 — watermarked stream-stream LEFT OUTER interval join: views
    * with their purchases within 1 hour, PLUS a null-extended row for
    * views that provably have none. The outer side is the genuinely
    * streaming-hard part: a null row may only emit once the watermark
    * passes the view's entire match window (v_ts + 1h) — before that,
    * a matching purchase could still arrive. Views near the tail of
    * the stream therefore never emit a null row (their state outlives
    * the query), and the oracle mirrors exactly that semantics: the
    * final watermark is max(ts) − 2h, and unmatched views qualify only
    * when v_ts + 1h < watermark. Matched rows are watermark-independent
    * (they emit on arrival) — same rows as q88. */
  def q145(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    def stream() = {
      val raw = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      graft.Fx.eventTs(raw)
    }
    val views = stream().filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("v_user"), $"ts".as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val buys = stream().filter($"event_type" === "purchase")
      .select($"event_id".as("buy_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
      .withWatermark("b_ts", "2 hours")
    val joined = views.join(buys,
      expr("v_user = b_user AND b_ts >= v_ts AND b_ts <= v_ts + interval 1 hour"),
      "left_outer")
      .select($"view_id", $"buy_id", $"v_user".as("user_id"))
    val sink = s"q145_sink_${counter.incrementAndGet()}"
    val query = joined.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q145: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).orderBy($"view_id", $"buy_id".asc_nulls_first)
  }

  val q145Sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
      |wm AS (SELECT max(t) - INTERVAL 2 HOUR AS w FROM ev),
      |v AS (SELECT event_id AS view_id, user_id, t AS v_ts FROM ev WHERE event_type = 'view'),
      |p AS (SELECT event_id AS buy_id, user_id, t AS b_ts FROM ev WHERE event_type = 'purchase'),
      |m AS (
      |  SELECT v.view_id, p.buy_id, v.user_id
      |  FROM v JOIN p ON v.user_id = p.user_id
      |   AND p.b_ts >= v.v_ts AND p.b_ts <= v.v_ts + INTERVAL 1 HOUR),
      |um AS (
      |  SELECT v.view_id, CAST(NULL AS BIGINT) AS buy_id, v.user_id
      |  FROM v CROSS JOIN wm
      |  WHERE v.v_ts + INTERVAL 1 HOUR < wm.w
      |    AND NOT EXISTS (SELECT 1 FROM p
      |                    WHERE p.user_id = v.user_id
      |                      AND p.b_ts >= v.v_ts AND p.b_ts <= v.v_ts + INTERVAL 1 HOUR))
      |SELECT view_id, buy_id, user_id FROM m
      |UNION ALL SELECT view_id, buy_id, user_id FROM um
      |ORDER BY view_id, buy_id NULLS FIRST""".stripMargin

  /** q114 — streaming content dedup-on-arrival over the documents
    * stream: custom flatMapGroupsWithState keyed by the 5-word-prefix
    * fingerprint (the cluster key with real duplicates in this corpus,
    * cf. q100) emits only first arrivals, smallest doc_id per
    * fingerprint — deterministic, so the FULL row set hash-matches the
    * batch keep-min-id oracle, not just the key set (stronger than
    * q74's dropDuplicates check). */
  def q114(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/documents.parquet"
    val schema = s.read.parquet(path).schema
    val docs = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
      .select($"doc_id",
        graft.functions.TextAnalysis.prefixFingerprint($"text").as("fp"),
        $"lang")
      .as[graft.streaming.Streams.ArrivingDoc]
    val sink = s"q114_sink_${counter.incrementAndGet()}"
    val query = graft.streaming.Streams.dedupOnArrival(docs)
      .writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q114: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).select($"doc_id", $"fp", $"lang").orderBy($"doc_id")
  }

  val q114Sql: String =
    """SELECT doc_id, fp, lang FROM (
      |  SELECT doc_id, fp, lang,
      |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |  FROM (SELECT doc_id, lang,
      |          md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
      |        FROM documents) t) r
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** q151 — chained stateful aggregation (Spark 3.4+ unblocked
    * multiple stateful operators in one streaming query): a 10-minute
    * tumbling count per event type feeds a SECOND windowed aggregation
    * that re-windows the slice column (`window($"window", "1 hour")`)
    * into hourly rollups — sum, peak slice, slice count — all inside
    * one APPEND-mode query with one watermark. This is the
    * pre-aggregation cascade a 100 TB metrics pipeline runs: the
    * second stage's state and shuffle are bounded by slice cardinality
    * (types × 6/hour), not event volume.
    *
    * Emission: the outer window closes when the watermark passes its
    * end; every 10-min slice inside a closed hour closed no later, so
    * the batch mirror gates on hour end only. Empty slices produce no
    * rows in either engine. */
  def q151(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema
    val raw = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val events = graft.Fx.eventTs(raw)
    val slices = events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n10"))
    val hourly = slices
      .groupBy(window($"window", "1 hour"), $"event_type")
      .agg(sum($"n10").as("n_events"), max($"n10").as("peak_slice"),
        count(lit(1)).as("n_slices"))
      .select($"window.start".as("hour"), $"event_type", $"n_events",
        $"peak_slice", $"n_slices")
    val sink = s"q151_sink_${counter.incrementAndGet()}"
    val query = hourly.writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    if (!query.awaitTermination(300000)) {
      query.stop()
      throw new IllegalStateException("q151: AvailableNow trigger did not complete in 300s")
    }
    s.table(sink).orderBy($"hour", $"event_type")
  }

  /** Batch twin: two-level group (10-min slice, then hour), gated on
    * the hour end by the same ms-truncated watermark as q72. */
  val q151Sql: String =
    """WITH wm AS (
      |  SELECT date_trunc('milliseconds', max(CAST(ts AS TIMESTAMP)))
      |         - INTERVAL 2 HOUR AS w
      |  FROM events),
      |slices AS (
      |  SELECT time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP)) AS slice,
      |    event_type, count(*) AS n10
      |  FROM events GROUP BY 1, 2),
      |hours AS (
      |  SELECT time_bucket(INTERVAL 1 HOUR, slice) AS hour, event_type,
      |    CAST(sum(n10) AS BIGINT) AS n_events, max(n10) AS peak_slice,
      |    CAST(count(*) AS BIGINT) AS n_slices
      |  FROM slices GROUP BY 1, 2)
      |SELECT hour, event_type, n_events, peak_slice, n_slices
      |FROM hours, wm WHERE hour + INTERVAL 1 HOUR <= wm.w
      |ORDER BY hour, event_type""".stripMargin

  /** q180 — streaming near-dup detection on arrival via Spark 4's
    * transformWithState (RocksDB state, ListState per SimHash band
    * key). Emits ALL qualifying pairs, so the verdict set is
    * arrival-order-invariant and equals the batch Hamming-ball join
    * exactly — the oracle IS q99's (TrainingQueries.q99Sql). */
  def q180(s: SparkSession, d: String): DataFrame =
    graft.streaming.NearDupStream.run(
      s, d, s"q180_sink_${counter.incrementAndGet()}")

  /** q191 — timer-closed streaming sessions (transformWithState,
    * EVENT-TIME timers): a session row is emitted when a later event
    * of the same user proves the 30-min gap, or when the final
    * watermark (ms-truncated max ts, 0s delay) passes end + gap and
    * fires the key's timer. The mirror rebuilds gap-split sessions on
    * the SAME ms grid the processor uses (Timestamp.getTime) and keeps
    * a session iff it is not the user's last OR the watermark reached
    * it. */
  def q191(s: SparkSession, d: String): DataFrame =
    graft.streaming.TwsSessions.run(
      s, d, s"q191_sink_${counter.incrementAndGet()}", gapMs = 1800000L)

  val q191Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms
      |  FROM events),
      |wm AS (SELECT max(ms) AS wm_ms FROM e),
      |g AS (
      |  SELECT user_id, event_id, ms,
      |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      |sid AS (
      |  SELECT user_id, ms,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM g),
      |sess AS (
      |  SELECT user_id, sess, min(ms) AS start_ms, max(ms) AS end_ms,
      |    count(*) AS n_events,
      |    row_number() OVER (PARTITION BY user_id ORDER BY sess DESC) AS rdesc
      |  FROM sid GROUP BY user_id, sess)
      |SELECT user_id, start_ms, end_ms, n_events
      |FROM sess CROSS JOIN wm
      |WHERE rdesc > 1 OR end_ms + 1800000 <= wm_ms
      |ORDER BY user_id, start_ms""".stripMargin

  /** q262 — streaming clamped balance (transformWithState, event-time
    * timers): the continuous twin of q260's batch parallel prefix.
    * Per-user bounded exposure — purchases add their cent value,
    * errors subtract, clamped into [0, 50000] — folded in EVENT-TIME
    * order regardless of arrival order: rows buffer in ListState and
    * only fold (and emit) once the watermark passes them, so the
    * emitted balances are arrival-order invariant and hash-match the
    * batch recursive-CTE statement of the same recurrence. State per
    * key = one folded balance + the un-finalized buffer (watermark-lag
    * bounded, not stream-bounded). */
  def q262(s: SparkSession, d: String): DataFrame =
    graft.streaming.ClampBalanceStream.run(
      s, d, s"q262_sink_${counter.incrementAndGet()}")

  val q262Sql: String =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms,
      |    CASE WHEN event_type = 'purchase'
      |         THEN CAST(floor(value * 100) AS BIGINT)
      |         ELSE -CAST(floor(value * 100) AS BIGINT) END AS delta
      |  FROM events WHERE event_type IN ('purchase', 'error')),
      |o AS (
      |  SELECT user_id, event_id, ms, delta,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ms, event_id) AS rn
      |  FROM e),
      |r(user_id, rn, bal) AS (
      |  SELECT user_id, rn, least(greatest(0 + delta, 0), 50000)
      |  FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.user_id, o.rn, least(greatest(r.bal + o.delta, 0), 50000)
      |  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
      |SELECT o.user_id, o.ms, o.event_id, r.bal AS balance
      |FROM r JOIN o ON r.user_id = o.user_id AND r.rn = o.rn
      |ORDER BY o.user_id, o.ms, o.event_id""".stripMargin

  /** q337 — streaming CUSUM control chart: q320's monitor actually
    * RUNNING as a stream, per-purchase. Calibrate-then-monitor
    * protocol (a live chart cannot use the retrospective mean): μ,
    * allowance and threshold are integers fixed by a batch pass, then
    * both one-sided clamped recurrences fold in EVENT-TIME order on
    * the q262 machinery (transformWithState, ListState buffer,
    * watermark-gated finalize — [[graft.streaming.CusumStream]]).
    * Two state keys, one per chart side: a control chart is ONE
    * sequential statistic by definition — parallelism lives in the
    * upstream scan, the fold IS the semantics; state per key is one
    * long plus the watermark-lag-bounded buffer. Emitted rows are
    * arrival-order invariant, hash-matching the recursive-CTE
    * statement of the same recurrence. */
  def q337(s: SparkSession, d: String): DataFrame =
    graft.streaming.CusumStream.run(
      s, d, s"q337_sink_${counter.incrementAndGet()}")

  val q337Sql: String =
    """WITH RECURSIVE p AS (
      |  SELECT event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms,
      |    CAST(floor(value * 100) AS BIGINT) AS x
      |  FROM events WHERE event_type = 'purchase'),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx FROM p),
      |mu AS (SELECT sx // n AS mu, n FROM st),
      |md AS (SELECT CAST(sum(abs(x - mu)) AS BIGINT) // max(n) AS mad,
      |         max(mu) AS mu
      |       FROM p CROSS JOIN mu),
      |d AS (
      |  SELECT 'up' AS side, ms, event_id,
      |    x - mu - (mad // 2) AS delta, 5 * mad AS h,
      |    row_number() OVER (ORDER BY ms, event_id) AS rn
      |  FROM p CROSS JOIN md
      |  UNION ALL
      |  SELECT 'down', ms, event_id,
      |    mu - x - (mad // 2), 5 * mad,
      |    row_number() OVER (ORDER BY ms, event_id)
      |  FROM p CROSS JOIN md),
      |r(side, rn, bal) AS (
      |  SELECT side, rn, greatest(delta, 0) FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.side, d.rn, greatest(r.bal + d.delta, 0)
      |  FROM r JOIN d ON d.side = r.side AND d.rn = r.rn + 1)
      |SELECT d.side AS side, d.ms, d.event_id, r.bal AS cusum,
      |  CAST(r.bal > d.h AS INT) AS alarm
      |FROM r JOIN d ON r.side = d.side AND r.rn = d.rn
      |ORDER BY side, ms, event_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q337_stream_cusum", q337, Some(q337Sql)),
    QueryDef("q72_streaming_hourly", q72, Some(q72Sql), bench = true),
    QueryDef("q262_stream_clamped_balance", q262, Some(q262Sql)),
    QueryDef("q180_stream_neardup_tws", q180, Some(TrainingQueries.q99Sql)),
    QueryDef("q191_stream_timer_sessions", q191, Some(q191Sql)),
    QueryDef("q74_streaming_dedup", q74, Some(q74Sql), bench = true),
    QueryDef("q114_streaming_content_dedup", q114, Some(q114Sql)),
    QueryDef("q75_stream_static_join", q75, Some(q75Sql)),
    QueryDef("q79_streaming_sessions", q79, Some(q79Sql)),
    QueryDef("q82_sliding_windows", q82, Some(q82Sql)),
    QueryDef("q88_stream_stream_join", q88, Some(q88Sql)),
    QueryDef("q145_stream_outer_join", q145, Some(q145Sql)),
    QueryDef("q151_chained_stream_agg", q151, Some(q151Sql)),
  )
}
