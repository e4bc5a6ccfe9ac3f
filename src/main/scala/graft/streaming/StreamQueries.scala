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

  /** b43: EventStream.hourlyAgg materialized through an actual
    * streaming query (memory sink, complete mode, AvailableNow) and
    * returned as the sink's table. Runs the stream synchronously; the
    * result is the micro-batch engine's own output, not a batch
    * re-computation. */
  def b43StreamParity(s: SparkSession, d: String): DataFrame = {
    val sink = "b43_stream_parity_sink"
    // idempotent across repeated calls in one session (Verify + Bench)
    s.catalog.dropTempView(sink)
    val q = EventStream.hourlyAgg(EventStream.readEvents(s, d))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    s.table(sink).orderBy("hour_epoch")
  }

  /** Same result contract as batch b11 — deliberately the same SQL. */
  val b43Sql: String = graft.queries.Relational.b11Sql

  val queries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("b43_stream_parity", b43StreamParity _, b43Sql))
}
