package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming layer (SURVEY §7 scale extension: the streaming
  * counterpart of the sessions table). The reference itself has no
  * streams; this is the engine's event-time path for the same rollups —
  * watermarked tumbling windows for the A5/A7-style aggregates, and
  * stateful gap-based sessionization (the batch `sessions` table,
  * derived online from raw events).
  */
object Sessionize {

  /** events schema for the streaming reader (ts arrives as epoch-micros
    * long or timestamp depending on the source; parquet testdata path
    * uses the long-nanos workaround in Tables). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Watermarked tumbling-window rollup: the streaming form of q18
    * (per-hour × event_type counts/sums). Late events beyond the
    * watermark are dropped; state is bounded by (windows in flight ×
    * event types). */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, nEvents: Long, total: Double)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long,
                         total_value: Double, duration_seconds: Long)

  /** Gap-based sessionization via flatMapGroupsWithState: a session
    * closes after `gapSeconds` of user inactivity (event-time timeout).
    * Emits one UserSession row per closed session — the streaming
    * equivalent of the batch sessions table (SURVEY §1.5 DStream row). */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
              s.nEvents, s.total, (s.last - s.start) / 1000))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = t, nEvents = s.nEvents + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed ::= UserSession(userId,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
                    s.nEvents, s.total, (s.last - s.start) / 1000)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** Watermarked stream-stream inner join: enrich an event stream with
    * the other stream's rows for the same user within a bounded
    * event-time window (here: an `error` event joined to the same user's
    * `click`s in the preceding hour). The time-range predicate plus both
    * watermarks is what BOUNDS the join state — without it Spark would
    * have to buffer both streams forever. Semantics are identical to the
    * equivalent batch range join (proven in spec). */
  def errorsWithRecentClicks(events: DataFrame,
                             watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    errors.join(clicks,
      expr("""user_id = c_user AND
              click_ts >= err_ts - INTERVAL 1 HOUR AND
              click_ts < err_ts"""))
      .select(col("user_id"), col("err_id"), col("err_ts"),
        col("click_ts"), col("click_value"))
  }

  /** Streaming dedup with bounded state: drops duplicate event_ids whose
    * event times fall within the watermark delay of each other — the
    * streaming counterpart of the batch exact-dedup pass
    * (operators.Dedup.exactDedup). State is bounded by the watermark:
    * old keys are evicted once the watermark passes them. */
  def streamingDedup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming EXACT dedup by CONTENT — the streaming twin of the batch
    * q25 pass (operators.Dedup.exactDedup): one surviving document per
    * md5(text), first arrival wins. Input must carry an `ingest_ts`
    * event-time column (any real document stream has one); keyed state
    * holds one entry per content hash inside the watermark window and is
    * evicted once the watermark passes — state scales with DISTINCT
    * content in the window, never with total documents streamed. A
    * duplicate arriving later than the watermark delay after its
    * original re-emits (the standard watermarked-dedup contract; the
    * batch pass is the backstop for cross-window dups, exactly the
    * batch/streaming split production dedup runs). */
  def streamingExactDedup(docs: DataFrame,
                          watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions.{col, md5}
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      .drop("text_hash") // internal helper; output schema = input schema,
                         // matching the batch exactDedup contract
  }

  /** Drive a streaming query synchronously from a bounded source into an
    * in-memory table (the local smoke harness — production would swap
    * source/sink for kafka/parquet). Returns the materialized result. */
  def runOnce(spark: SparkSession, streaming: DataFrame, name: String): DataFrame = {
    val q = streaming.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Soak evidence from a chunked replay: result table plus the
    * micro-batch count and stateful-operator row counts observed while
    * the query ran. `maxStateRows` is THE bounded-state claim — for gap
    * sessionization it must stay ≤ live users (one open session each),
    * never grow with total events; for windowed rollups ≤ windows in
    * flight × group cardinality. */
  case class SoakReport(result: DataFrame, microBatches: Int,
                        finalStateRows: Long, maxStateRows: Long)

  /** Like [[runOnce]] but captures progress evidence. Pair with a
    * file source chunked into many files + `maxFilesPerTrigger=1`, so
    * the bounded input replays as MANY micro-batches with an advancing
    * watermark — the closest local-mode analogue of a long-running
    * production stream.
    *
    * Stats come from a [[StreamingQueryListener]], NOT
    * `query.recentProgress`: the latter is capped (default 100 entries),
    * so a long replay would silently under-count micro-batches and
    * could miss the true state-rows peak — exactly what a soak exists
    * to catch. Listener delivery is async, so after stop() we wait for
    * the event stream to drain (count stable across polls). */
  def runWithProgress(spark: SparkSession, streaming: DataFrame,
                      name: String): SoakReport = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val listener = new StreamingQueryListener {
      import StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.name == name) seen.synchronized {
          seen += ((e.progress.numInputRows,
            e.progress.stateOperators.map(_.numRowsTotal).sum))
        }
    }
    spark.streams.addListener(listener)
    try {
      val q = streaming.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      q.processAllAvailable()
      q.stop()
      // wait for the async listener bus to drain: require a sustained
      // quiet window (5 polls) and FAIL LOUDLY on timeout — returning
      // partial stats silently would reintroduce the undercounting this
      // listener exists to eliminate
      var prev = -1
      var stable = 0
      var waited = 0
      while (stable < 5 && waited < 30000) {
        val n = seen.synchronized(seen.size)
        if (n == prev) stable += 1 else { stable = 0; prev = n }
        Thread.sleep(100)
        waited += 100
      }
      require(stable >= 5,
        "runWithProgress: listener event stream did not quiesce within 30s — stats would be partial")
    } finally spark.streams.removeListener(listener)
    val snap = seen.synchronized(seen.toList)
    val state = snap.map(_._2)
    SoakReport(spark.table(name),
      microBatches = snap.count(_._1 > 0),
      finalStateRows = state.lastOption.getOrElse(0L),
      maxStateRows = if (state.isEmpty) 0L else state.max)
  }
}
