package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.cap.{CapAlert, CapPipeline, CotFeature}

/** Lifecycle state carried across micro-batches for one alert id. */
final case class AlertLifecycle(identifier: String, status: String,
    msgTypes: Seq[String], lastSent: String)

/** One emitted state transition of one alert id (audit-log row). */
final case class AlertTransition(identifier: String, fromStatus: String,
    toStatus: String, msgType: String, sent: String)

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

  /** Streaming source: one CAP XML document per file in `xmlDir`.
    * No maxFilesPerTrigger cap by default: with Trigger.AvailableNow
    * that means ONE micro-batch over the whole directory, which is what
    * makes `features` reproduce the batch pipeline exactly (a cap would
    * split event-time-unordered files across batches and the watermark
    * in `severityCounts` would then legitimately drop late ones). Pass
    * `maxFilesPerTrigger > 0` for incremental continuous deployments. */
  def alerts(spark: SparkSession, xmlDir: String,
      maxFilesPerTrigger: Int = 0): Dataset[CapAlert] = {
    import spark.implicits._
    val reader = spark.readStream.option("wholetext", "true")
    val capped =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      else reader
    CapPipeline.parseAlerts(capped.text(xmlDir).as[String])
  }

  /** Features stream with a DETERMINISTIC clock — for tests and
    * replayable backfills. Dedup keys on `identifier` BEFORE the
    * fan-out so state is one row per alert, not per feature. Plain
    * dropDuplicates state grows with distinct alert ids (fine for CAP
    * feeds: tens of ids; use [[featuresNow]]'s watermarked dedup for
    * unbounded streams). */
  def features(alerts: Dataset[CapAlert], asOf: Instant): Dataset[CotFeature] =
    CapPipeline.toFeatures(
      CapPipeline.filterActive(alerts, asOf).dropDuplicates("identifier"))

  /** Production streaming variant: per-batch wall clock (the reference
    * re-evaluates `new Date()` every scheduled run — a frozen asOf
    * would keep emitting alerts that expired after query start) and
    * watermarked dedup so state is dropped once `sent` falls behind
    * the watermark. */
  def featuresNow(alerts: Dataset[CapAlert]): Dataset[CotFeature] = {
    import alerts.sparkSession.implicits._
    val jsExpiresMs = udf((s: String) =>
      graft.functions.JsCompat.jsDateParse(s).map(_.toEpochMilli))
    val active = alerts.filter(
      col("expires") === "" ||
        coalesce(jsExpiresMs(col("expires")) >=
          unix_millis(current_timestamp()), lit(true)))
    CapPipeline.toFeatures(
      active
        .withColumn("sent_ts", to_timestamp(col("sent")))
        .withWatermark("sent_ts", "1 hour")
        .dropDuplicatesWithinWatermark("identifier")
        .drop("sent_ts")
        .as[CapAlert])
  }

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
    * sent. Arbitrary stateful processing the reference cannot express.
    * State holds one row per distinct alert id (CAP feeds: tens); an
    * unbounded-id deployment would add a state timeout. Ordering and
    * recency compare PARSED instants, not raw strings — CAP timestamps
    * mix UTC offsets (`+12:00` vs `Z`), so lexicographic comparison
    * would pick a wall-clock-later-but-absolute-earlier value. */
  def lifecycle(alerts: Dataset[CapAlert]): Dataset[AlertLifecycle] = {
    import alerts.sparkSession.implicits._
    def epochMs(s: String): Long =
      graft.functions.JsCompat.jsDateParse(s).map(_.toEpochMilli).getOrElse(Long.MinValue)
    alerts.groupByKey(_.identifier)
      .mapGroupsWithState[AlertLifecycle, AlertLifecycle](GroupStateTimeout.NoTimeout()) {
        (id, batch, state) =>
          val prior = state.getOption.getOrElse(AlertLifecycle(id, "none", Seq.empty, ""))
          // deterministic within-batch order: by absolute time, then msgType
          val sorted = batch.toSeq.sortBy(a => (epochMs(a.sent), a.msgType))
          val next = sorted.foldLeft(prior) { (st, a) =>
            val status = a.msgType match {
              case "Cancel" => "cancelled"
              case _ if st.status == "cancelled" => "cancelled" // terminal
              case _ => "active"
            }
            AlertLifecycle(id, status, st.msgTypes :+ a.msgType,
              if (st.lastSent.isEmpty || epochMs(a.sent) > epochMs(st.lastSent)) a.sent
              else st.lastSent)
          }
          state.update(next)
          next
      }
  }

  /** Per-transition audit log via `flatMapGroupsWithState` — the
    * multi-row sibling of [[lifecycle]]: where mapGroupsWithState must
    * collapse each group-batch to ONE row (latest state), this emits
    * one row per state TRANSITION (none→active, active→cancelled, …),
    * which is what a downstream audit/compliance consumer ingests.
    * Same deterministic within-batch ordering and terminal-cancel
    * semantics; state is the single latest status per alert id, so
    * streaming state stays O(live alerts) regardless of history
    * length. Update output mode in streaming; identical rows in batch
    * via the spec's replay comparison.
    */
  def lifecycleTransitions(alerts: Dataset[CapAlert]): Dataset[AlertTransition] = {
    import alerts.sparkSession.implicits._
    def epochMs(s: String): Long =
      graft.functions.JsCompat.jsDateParse(s).map(_.toEpochMilli).getOrElse(Long.MinValue)
    alerts.groupByKey(_.identifier)
      .flatMapGroupsWithState[String, AlertTransition](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (id, batch, state) =>
          var status = state.getOption.getOrElse("none")
          val sorted = batch.toSeq.sortBy(a => (epochMs(a.sent), a.msgType))
          val out = sorted.flatMap { a =>
            val next = a.msgType match {
              case "Cancel" => "cancelled"
              case _ if status == "cancelled" => "cancelled" // terminal
              case _ => "active"
            }
            val row =
              if (next != status) Some(AlertTransition(id, status, next, a.msgType, a.sent))
              else None
            status = next
            row
          }
          state.update(status)
          out.iterator
      }
  }
}
