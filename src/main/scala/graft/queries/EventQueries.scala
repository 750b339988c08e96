package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.EventStreams

/** Stream-shaped operator coverage over `events` — the batch-mode
  * equivalents of the Structured Streaming pipelines (identical
  * DataFrame code runs in both modes; the streaming path itself is
  * exercised in EventStreamsSpec with a memory sink).
  */
object EventQueries {

  val queries: Seq[Q] = Seq(

    // Tumbling 1-hour windows per event type.
    Q("events_tumbling_window",
      (s, dir) => {
        Tables.registerAll(s, dir)
        EventStreams.tumblingAgg(s.table("events"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some("""SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
             |  event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // Sliding 1-hour windows every 30 minutes.
    Q("events_sliding_window",
      (s, dir) => {
        Tables.registerAll(s, dir)
        EventStreams.slidingAgg(s.table("events"))
          .orderBy(col("window_start"))
      },
      // every event belongs to exactly two 30-min-aligned 1-h windows
      Some("""WITH w AS (
             |  SELECT unnest([
             |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
             |    make_timestamp(((epoch_us(ts) // 1800000000) - 1) * 1800000000)
             |  ]) AS window_start
             |  FROM events)
             |SELECT window_start, COUNT(*) AS n_events
             |FROM w GROUP BY 1 ORDER BY window_start""".stripMargin)),

    // Gap-based sessionization (30-min inactivity closes a session).
    // Session bounds travel as BIGINT epoch-microseconds on BOTH sides:
    // rendered-timestamp comparison is representation-sensitive (the one
    // historic hash mismatch), int64 micros are not. Likewise the oracle
    // casts its windowed SUM to BIGINT — DuckDB widens SUM(int) to
    // HUGEINT, whose export representation differs from Spark's int64.
    Q("events_sessionization",
      (s, dir) => {
        Tables.registerAll(s, dir)
        import s.implicits._
        val ev = s.table("events")
          .selectExpr("event_id", "ts", "user_id", "event_type", "value")
          .as[EventStreams.Event]
        EventStreams.sessionizeBatchComplete(ev)
          .select(col("user_id"), col("session_id"), col("n_events"),
            unix_micros(col("start_ts").cast("timestamp")).as("start_us"),
            unix_micros(col("end_ts").cast("timestamp")).as("end_us"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, event_id, ts,
             |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events),
             |flagged AS (
             |  SELECT user_id, event_id, ts,
             |         CASE WHEN prev_ts IS NULL OR (epoch_us(ts) - epoch_us(prev_ts)) > 1800000000
             |              THEN 1 ELSE 0 END AS new_session
             |  FROM ordered),
             |numbered AS (
             |  SELECT user_id, event_id, ts,
             |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |       epoch_us(MIN(ts)) AS start_us,
             |       epoch_us(MAX(ts)) AS end_us
             |FROM numbered GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // Per-user event-type transition counts (stream-shaped feature).
    Q("events_transitions",
      (s, dir) => {
        Tables.registerAll(s, dir)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        s.table("events")
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .where(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("prev_type"), col("event_type"))
      },
      Some("""WITH t AS (
             |  SELECT event_type,
             |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |  FROM events)
             |SELECT prev_type, event_type, COUNT(*) AS n
             |FROM t WHERE prev_type IS NOT NULL
             |GROUP BY prev_type, event_type ORDER BY prev_type, event_type""".stripMargin)),

    // As-of join: each event attaches the LATEST sparse per-user
    // checkpoint at-or-before its timestamp (checkpoints = hours with
    // ≥3 events, so matches genuinely look back across hours). The
    // oracle is DuckDB's native ASOF JOIN; the Spark side is the
    // union + tagged-sort + running-last plan (one shuffle, no join
    // node — ops/AsofJoin).
    Q("events_asof_join",
      (s, dir) => {
        Tables.registerAll(s, dir)
        val ev = s.table("events").select(col("event_id"), col("user_id"), col("ts"))
        val cp = s.table("events")
          .groupBy(col("user_id"),
            expr("timestamp_micros((unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000) * 3600000000)")
              .as("cp_ts"))
          .agg(count(lit(1)).as("cp_n"))
          .where(col("cp_n") >= 3)
        graft.ops.AsofJoin.asof(ev, cp, Seq("user_id"), "ts", "cp_ts")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            unix_micros(col("cp_ts").cast("timestamp")).as("cp_us"),
            col("cp_n"))
          .orderBy(col("event_id"))
      },
      Some("""WITH cp AS (
             |  SELECT user_id,
             |         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS cp_ts,
             |         COUNT(*) AS cp_n
             |  FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 3)
             |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
             |       epoch_us(cp.cp_ts) AS cp_us, cp.cp_n
             |FROM events e
             |ASOF JOIN cp ON e.user_id = cp.user_id AND e.ts >= cp.cp_ts
             |ORDER BY e.event_id""".stripMargin)),

    // Interval-overlap join: per-user daily activity spans × the 40
    // BUSIEST hourly windows per event type (top-k, not a count
    // threshold — so the right side stays 200 rows at every SF and
    // the result scales with the spans, not quadratically with
    // density). DuckDB plans the raw inequality with its IEJoin; the
    // Spark side bucketizes both interval sets and hash-joins the
    // buckets (ops/IntervalJoin) — the QueriesSmokeSpec
    // cartesian/BNLJ gate proves no fallback.
    Q("events_interval_join",
      (s, dir) => {
        Tables.registerAll(s, dir)
        import org.apache.spark.sql.expressions.Window
        val us = unix_micros(col("ts").cast("timestamp"))
        val spans = s.table("events")
          .groupBy(col("user_id"),
            expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("__day"))
          .agg(min(us).as("s_start"), max(us).as("s_end"))
          .drop("__day")
        val rk = Window.partitionBy(col("event_type"))
          .orderBy(col("__n").desc, col("w_start"))
        val wins = s.table("events")
          .groupBy(col("event_type"),
            expr("(unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000) * 3600000000")
              .as("w_start"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__rk", row_number().over(rk))
          .where(col("__rk") <= 40)
          .withColumn("w_end", col("w_start") + 3599999999L)
          .drop("__n", "__rk")
        graft.ops.IntervalJoin
          .overlapJoin(spans, wins, "s_start", "s_end", "w_start", "w_end",
            bucket = 3600000000L)
          .select(col("user_id"), col("s_start"), col("event_type"), col("w_start"))
          .orderBy(col("user_id"), col("s_start"), col("event_type"), col("w_start"))
      },
      Some("""WITH spans AS (
             |  SELECT user_id, epoch_us(MIN(ts)) AS s_start, epoch_us(MAX(ts)) AS s_end
             |  FROM events GROUP BY user_id, epoch_us(ts) // 86400000000),
             |wins AS (
             |  SELECT event_type, w_start, w_start + 3599999999 AS w_end FROM (
             |    SELECT event_type, (epoch_us(ts) // 3600000000) * 3600000000 AS w_start,
             |           COUNT(*) AS n
             |    FROM events GROUP BY 1, 2
             |    QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY n DESC, w_start) <= 40))
             |SELECT s.user_id, s.s_start, w.event_type, w.w_start
             |FROM spans s JOIN wins w ON s.s_start <= w.w_end AND w.w_start <= s.s_end
             |ORDER BY s.user_id, s.s_start, w.event_type, w.w_start""".stripMargin)),
  )
}
