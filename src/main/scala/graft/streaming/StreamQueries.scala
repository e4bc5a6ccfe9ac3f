package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming surfaces exposed on the driver's oracled queries list.
  *
  * The 8 streaming concepts (SURVEY §2.9) are spec-gated in
  * CapStreamSpec/EventStreamSpec; this adds the driver-checkable gate:
  * the streaming hourly aggregation MUST reproduce batch b11 bit for
  * bit, so its oracle IS b11's oracle. `Trigger.AvailableNow` drains
  * the source as bounded micro-batches and terminates — the
  * batch/stream-unification contract Structured Streaming is built on,
  * here held to the same rows+schema+hash standard as every batch
  * operator.
  */
object StreamQueries {

  /** Materialize a streaming DataFrame through an actual micro-batch
    * run: memory sink, complete mode, `Trigger.AvailableNow`, blocking
    * until the source is drained. Idempotent across repeated calls in
    * one session (Verify + Bench) via dropTempView. */
  private def runToTable(s: SparkSession, sink: String, df: DataFrame): DataFrame = {
    s.catalog.dropTempView(sink)
    val q = df.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    s.table(sink)
  }

  /** b43: EventStream.hourlyAgg through the micro-batch engine — the
    * result is the streaming runtime's own output, not a batch
    * re-computation. */
  def b43StreamParity(s: SparkSession, d: String): DataFrame =
    runToTable(s, "b43_stream_parity_sink",
      EventStream.hourlyAgg(EventStream.readEvents(s, d)))
      .orderBy("hour_epoch")

  /** Same result contract as batch b11 — deliberately the same SQL. */
  val b43Sql: String = graft.queries.Relational.b11Sql

  /** b44: the stream-static broadcast enrichment (events × customer
    * dimension → per-segment rollup) through the micro-batch engine.
    * The static side is re-read per micro-batch and never stateful;
    * the oracle is the plain batch join it must equal. */
  def b44StreamSegment(s: SparkSession, d: String): DataFrame =
    runToTable(s, "b44_stream_segment_sink",
      EventStream.segmentAgg(EventStream.readEvents(s, d),
        graft.sources.Tables.customer(s, d)))
      .orderBy("segment")

  val b44Sql: String =
    """SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
      |       COUNT(*) AS n_events,
      |       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_value
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** b45: native session windows (30-minute inactivity gap) through
    * the micro-batch engine, oracled against the windowed-SQL
    * sessionization. Spark's session_window is [start, end) with
    * end = last event + gap, merging while the next event falls
    * strictly inside the current end — i.e. a gap of exactly 30
    * minutes STARTS a new session, which the oracle mirrors with
    * `>= 1800000000` on the microsecond delta. */
  def b45StreamSessions(s: SparkSession, d: String): DataFrame =
    runToTable(s, "b45_stream_sessions_sink",
      EventStream.sessionAgg(EventStream.readEvents(s, d)))
      .orderBy("user_id", "sess_start_us")

  val b45Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tsus, value FROM events),
      |x AS (SELECT user_id, tsus, value,
      |             CASE WHEN tsus - LAG(tsus) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsus)),
      |g AS (SELECT user_id, tsus, value,
      |             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsus
      |                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      |      FROM x)
      |SELECT user_id, MIN(tsus) AS sess_start_us,
      |       MAX(tsus) + 1800000000 AS sess_end_us,
      |       COUNT(*) AS n_events,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_value
      |FROM g GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start_us""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("b43_stream_parity", b43StreamParity _, b43Sql),
    ("b44_stream_segment", b44StreamSegment _, b44Sql),
    ("b45_stream_sessions", b45StreamSessions _, b45Sql))
}
