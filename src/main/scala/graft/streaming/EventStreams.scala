package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Stream processing over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine has no stream processing (SURVEY §2.10) — this
  * is the extension surface: Structured Streaming pipelines whose
  * batch-mode equivalents are what the driver's oracle verifies
  * (identical DataFrame code runs in both modes — the Spark streaming
  * contract).
  *
  * Scale: windowed aggregation state is bounded by the watermark;
  * sessionization state is per-user and times out; both shuffle on
  * (window/user) keys only.
  */
object EventStreams {

  /** The events schema as Spark reads it (ts normalized to µs — see
    * Tables.registerAll).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window aggregation: per (1-hour window, event_type)
    * counts and exact sums. Works identically over a batch or
    * streaming DataFrame.
    */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window event rate (1 h window every 30 min). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))

  /** Start the streaming variant of `tumblingAgg` from a parquet
    * directory source with a watermark, into a named memory sink.
    */
  def startTumblingStream(
      spark: SparkSession, sourceDir: String, queryName: String,
      watermark: String = "2 hours"): StreamingQuery = {
    // watermarks require TIMESTAMP (instant) event time; the session
    // runs in UTC so the cast preserves wall-clock values
    val src = spark.readStream
      .schema(eventSchema)
      .parquet(sourceDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
    tumblingAgg(src).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming exactly-once dedup over an at-least-once source:
    * duplicates of `idCols` arriving within the watermark horizon are
    * dropped (`dropDuplicatesWithinWatermark`), so state is bounded by
    * the watermark instead of growing with the stream — the streaming
    * face of the batch dedup family (Dedup.dropExactDuplicates).
    */
  def startDedupStream(
      spark: SparkSession, sourceDir: String, queryName: String,
      idCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours"): StreamingQuery = {
    val src = spark.readStream
      .schema(eventSchema)
      .parquet(sourceDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)
    src.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming face of the as-of join for the stream-static shape: a
    * stream of events attaches the latest row of a STATIC (broadcast)
    * timestamped dimension at-or-before each event. Candidates fan
    * out per eligible dimension row and collapse with `max_by` per
    * event — update-mode aggregation keyed by the event id, state one
    * row per in-flight event. (The stream-STREAM as-of needs the
    * union+window plan of ops.AsofJoin, which streaming windows can't
    * express — pair a stream with a slowly-changing static side, the
    * realistic shape.)
    */
  def startAsofStream(
      spark: SparkSession, sourceDir: String, queryName: String,
      checkpoints: DataFrame, keys: Seq[String],
      rightTs: String): StreamingQuery = {
    val src = spark.readStream
      .schema(eventSchema)
      .parquet(sourceDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val rPayload = checkpoints.columns.toSeq.filterNot(keys.contains)
    val joined = src.join(
      org.apache.spark.sql.functions.broadcast(checkpoints),
      keys.map(k => src(k) === checkpoints(k))
        .reduce(_ && _) && col(rightTs) <= col("ts"),
      "inner")
    joined
      .groupBy(col("event_id"))
      .agg(
        first(col("ts")).as("ts"),
        max_by(struct(rPayload.map(col): _*), col(rightTs)).as("__m"))
      .select(Seq(col("event_id"), col("ts")) ++
        rPayload.map(c => col("__m").getField(c).as(c)): _*)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  // ── stateful sessionization ────────────────────────────────────────

  final case class Event(event_id: Long, ts: java.time.LocalDateTime, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionInfo(user_id: Long, session_id: Long, n_events: Long,
                               start_ts: java.time.LocalDateTime, end_ts: java.time.LocalDateTime)
  final case class SessionState(sessionSeq: Long, nEvents: Long,
                                startUs: Long, lastUs: Long)

  /** Gap-based sessionization with custom state
    * (flatMapGroupsWithState): a session closes after `gapMinutes` of
    * user inactivity; emits one row per closed session.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Long = 30): Dataset[SessionInfo] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60 * 1000000L

    // microsecond precision: toEpochMilli would truncate the µs
    // component the events carry and misplace sessions near the gap
    def us(t: java.time.LocalDateTime): Long = {
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def fromUs(u: Long): java.time.LocalDateTime =
      java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(Math.floorDiv(u, 1000000L),
          Math.floorMod(u, 1000000L) * 1000L),
        java.time.ZoneOffset.UTC)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionInfo](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          // events within one micro-batch arrive unordered → sort
          val sorted = it.toSeq.sortBy(e => (us(e.ts), e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[SessionInfo]()
          var st = state.getOption.getOrElse(SessionState(0, 0, 0, Long.MinValue))
          sorted.foreach { e =>
            val t = us(e.ts)
            if (st.nEvents > 0 && t - st.lastUs > gapUs) {
              out += SessionInfo(userId, st.sessionSeq, st.nEvents, fromUs(st.startUs), fromUs(st.lastUs))
              st = SessionState(st.sessionSeq + 1, 1, t, t)
            } else if (st.nEvents == 0) {
              st = st.copy(nEvents = 1, startUs = t, lastUs = t)
            } else {
              st = st.copy(nEvents = st.nEvents + 1, lastUs = t)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Flush still-open sessions (batch-mode epilogue): emit the current
    * state per user as a final session. Batch flatMapGroupsWithState
    * runs exactly one "batch", so closed sessions come from
    * `sessionize` and open ones from the per-user tail; this helper
    * computes the full session list batch-side for verification.
    */
  def sessionizeBatchComplete(events: Dataset[Event], gapMinutes: Long = 30): DataFrame = {
    import events.sparkSession.implicits._
    // gap compared in exact microseconds (unix_micros) — second-level
    // truncation could misclassify a gap within 1s of the threshold
    val gapUs = gapMinutes * 60 * 1000000L
    events.toDF().createOrReplaceTempView("_sess_events")
    events.sparkSession.sql(
      s"""WITH ordered AS (
         |  SELECT user_id, event_id, ts,
         |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM _sess_events),
         |flagged AS (
         |  SELECT user_id, event_id, ts,
         |         CASE WHEN prev_ts IS NULL
         |                OR (unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(prev_ts AS TIMESTAMP))) > $gapUs
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM ordered),
         |numbered AS (
         |  SELECT user_id, event_id, ts,
         |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |       MIN(ts) AS start_ts, MAX(ts) AS end_ts
         |FROM numbered GROUP BY user_id, session_id""".stripMargin)
  }
}
