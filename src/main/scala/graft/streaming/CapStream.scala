package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.cap.{CapAlert, CapPipeline, CotFeature}

/** Lifecycle state carried across micro-batches for one alert id. */
final case class AlertLifecycle(identifier: String, status: String,
    msgTypes: Seq[String], lastSent: String)

/** Streaming mode for the CAP pipeline (SURVEY §2.9): the reference's
  * "streaming" is scheduled whole-batch re-execution (task.ts:66); here
  * the same operators run as a Structured Streaming job —
  * `Trigger.AvailableNow` replaces the external scheduler, incremental
  * file listing replaces refetching, within-stream dedup replaces the
  * downstream upsert, and `mapGroupsWithState` adds the alert-lifecycle
  * tracking the reference leaves to CloudTAK (msgType field exists at
  * task.ts:31 but is never consumed).
  *
  * All transforms below are the SAME operators as the batch path
  * (CapPipeline.parseAlerts / filterActive / toFeatures run unchanged on
  * streaming Datasets) — the engine's batch/stream unification story.
  */
object CapStream {

  /** Streaming source: one CAP XML document per file in `xmlDir`. */
  def alerts(spark: SparkSession, xmlDir: String): Dataset[CapAlert] = {
    import spark.implicits._
    val xml = spark.readStream
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", "100")
      .text(xmlDir)
      .as[String]
    CapPipeline.parseAlerts(xml)
  }

  /** Features stream: parse → expiry filter → within-stream dedup by
    * feature id → fan-out. Dedup keys on `identifier` BEFORE the
    * fan-out so state is one row per alert, not per feature. */
  def features(alerts: Dataset[CapAlert], asOf: Instant): Dataset[CotFeature] =
    CapPipeline.toFeatures(
      CapPipeline.filterActive(alerts, asOf).dropDuplicates("identifier"))

  /** Tumbling-window severity counts with a watermark on `sent` — the
    * streaming analog of the batch B11 time-window aggregation. Late
    * alerts beyond 10 minutes are dropped by the watermark, bounding
    * state. */
  def severityCounts(alerts: Dataset[CapAlert]): DataFrame =
    alerts
      .withColumn("sent_ts", to_timestamp(col("sent")))
      .filter(col("sent_ts").isNotNull)
      .withWatermark("sent_ts", "10 minutes")
      .groupBy(window(col("sent_ts"), "1 hour"), col("severity"))
      .agg(count(lit(1)).as("n"))

  /** Alert lifecycle (Alert → Update* → Cancel) via mapGroupsWithState:
    * per-identifier state accumulates the msgType chain; a Cancel marks
    * the alert cancelled, an Update keeps it active with the latest
    * sent. Arbitrary stateful processing the reference cannot express. */
  def lifecycle(alerts: Dataset[CapAlert]): Dataset[AlertLifecycle] = {
    import alerts.sparkSession.implicits._
    alerts.groupByKey(_.identifier)
      .mapGroupsWithState[AlertLifecycle, AlertLifecycle](GroupStateTimeout.NoTimeout()) {
        (id, batch, state) =>
          val prior = state.getOption.getOrElse(AlertLifecycle(id, "none", Seq.empty, ""))
          // deterministic within-batch order: by sent, then msgType
          val sorted = batch.toSeq.sortBy(a => (a.sent, a.msgType))
          val next = sorted.foldLeft(prior) { (st, a) =>
            val status = a.msgType match {
              case "Cancel" => "cancelled"
              case _ if st.status == "cancelled" => "cancelled" // terminal
              case _ => "active"
            }
            AlertLifecycle(id, status, st.msgTypes :+ a.msgType,
              if (a.sent > st.lastSent) a.sent else st.lastSent)
          }
          state.update(next)
          next
      }
  }
}
