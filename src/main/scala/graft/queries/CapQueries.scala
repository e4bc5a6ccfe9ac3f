package graft.queries

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cap.CapPipeline

/** CAP ETL pipeline exposed on the driver's queries surface. Not
  * SQL-expressible (XML + custom fan-out semantics), so there is no
  * DuckDB oracle — the driver records a rows-only check; full semantic
  * coverage lives in the ScalaTest suites + golden files.
  */
object CapQueries {

  /** Deterministic clock for F1 (SURVEY.md §5 determinism rule). */
  val asOf: Instant = Instant.parse("2026-08-12T00:00:00Z")

  /** Fixture roots: relative when running from the repo checkout
    * (tests, sbt), falling back to the driver's absolute layout. */
  private def resolve(rel: String): String =
    if (new java.io.File(rel).exists()) rel else s"/root/repo/$rel"

  def fixtureDir: String = resolve("fixtures/cap")
  def feedDir: String = resolve("fixtures/feed")
  def badFixtureDir: String = resolve("fixtures/cap_bad")
  def lifecycleFixtureDir: String = resolve("fixtures/cap_lifecycle")

  /** Full pipeline: alert XML fixtures → CoT features, projected to
    * (id, json) — `json` is the COMPLETE rendered feature (the
    * reference's actual output format), so every envelope/metadata/
    * geometry/style field participates in the oracle hash while the
    * compare stays engine-portable (two string columns, no nested
    * types). The typed Dataset surface is [[CapPipeline.run]]. */
  def capFeatures(s: SparkSession, d: String): DataFrame =
    CapPipeline.run(s, fixtureDir, asOf)
      .toDF()
      .select(col("id"), col("json"))
      .orderBy(col("id"))

  /** P1-P3: feed-link extraction over RSS+Atom fixture feeds, in the
    * reference's first-occurrence order (order-preserving dedup). */
  def capFeedLinks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feeds = s.read.option("wholetext", "true").text(feedDir).as[String]
    CapPipeline.parseFeedLinks(feeds).toDF("link")
  }

  /** F2 quarantine surface over a fixture set with PLANTED bad alerts
    * (unparseable `sent`/`onset` — the reference's per-alert
    * try/catch-and-drop, task.ts:876-878, upgraded to a side-channel):
    * the full pipeline runs and the quarantined (identifier, error)
    * rows come back. `persist = false` — only one side of the fused
    * fan-out is materialized here. */
  def capQuarantine(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val xml = s.read.option("wholetext", "true").text(badFixtureDir).as[String]
    val alerts = CapPipeline.filterActive(CapPipeline.parseAlerts(xml), asOf)
    val quarantine = CapPipeline.toFeaturesWithQuarantine(alerts, persist = false).quarantine
    quarantine.toDF().select(col("identifier"), col("error")).orderBy("identifier")
  }

  /** Golden-file oracles: the driver's DuckDB compare reads a
    * checked-in expected-output parquet (regenerate with
    * `runMain graft.GoldenGen` after an INTENDED semantic change).
    * The goldens are locked to the hand-verified fixture JSON goldens
    * (fixtures/golden) by CapPipelineSpec/FeaturesSpec — this
    * turns the XML pipeline's spec coverage into a driver-checkable
    * rows+schema+hash gate instead of a rows-only smoke check. */
  private def golden(name: String): String = s"/root/repo/fixtures/golden/$name"

  val cap1Sql: String =
    s"SELECT id, json FROM '${golden("cap1_features.parquet")}' ORDER BY id"

  val cap2Sql: String =
    s"SELECT link FROM '${golden("cap2_feed_links.parquet")}'"

  val cap3Sql: String =
    s"SELECT identifier, error FROM '${golden("cap3_quarantine.parquet")}' ORDER BY identifier"

  /** Run a streaming Dataset through the micro-batch engine (Update
    * mode — what mapGroupsWithState requires) and read the committed
    * result back. Same [[graft.streaming.StreamRunner]] path as b43–b47
    * (RocksDB state, exactly-once file sink, no driver-resident stream
    * results — the memory-sink form this replaced was the last holdout
    * of that pattern). One AvailableNow batch over the fixture dir, so
    * each alert id yields exactly one update row — the golden compare
    * DEPENDS on that (update mode emits one row per key per batch), so
    * StreamRunner asserts the single-data-batch premise loudly: if a
    * future maxFilesPerTrigger default or added fixtures ever split the
    * source into multiple batches, this fails here instead of silently
    * diverging from the golden with duplicate per-id rows. */
  private def runStream(s: SparkSession, sink: String, df: DataFrame): DataFrame =
    graft.streaming.StreamRunner.run(s, sink, lifecycleFixtureDir, df,
      "update", requireSingleDataBatch = true)

  /** cap4: the mapGroupsWithState alert lifecycle (Alert → Update* →
    * Cancel, terminal cancel) over a fixture chain, run through the
    * ACTUAL stateful streaming operator — the arbitrary-stateful-
    * processing surface the reference cannot express, held to a golden
    * oracle like every other query. */
  def capLifecycle(s: SparkSession, d: String): DataFrame = {
    val alerts = graft.streaming.CapStream.alerts(s, lifecycleFixtureDir)
    runStream(s, "cap4_lifecycle_sink",
      graft.streaming.CapStream.lifecycle(alerts).toDF()
        .select(col("identifier"), col("status"),
          concat_ws("|", col("msgTypes")).as("msg_chain"),
          col("lastSent").as("last_sent")))
      .orderBy("identifier")
  }

  /** cap5: the flatMapGroupsWithState per-transition audit log over
    * the same fixture chain — one row per state transition. */
  def capTransitions(s: SparkSession, d: String): DataFrame = {
    val alerts = graft.streaming.CapStream.alerts(s, lifecycleFixtureDir)
    runStream(s, "cap5_transitions_sink",
      graft.streaming.CapStream.lifecycleTransitions(alerts).toDF()
        .select(col("identifier"), col("fromStatus").as("from_status"),
          col("toStatus").as("to_status"), col("msgType").as("msg_type"),
          col("sent")))
      .orderBy("identifier", "sent")
  }

  val cap4Sql: String =
    s"SELECT identifier, status, msg_chain, last_sent FROM '${golden("cap4_lifecycle.parquet")}' ORDER BY identifier"

  val cap5Sql: String =
    s"SELECT identifier, from_status, to_status, msg_type, sent FROM '${golden("cap5_transitions.parquet")}' ORDER BY identifier, sent"

  val queries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("cap1_features", capFeatures _, cap1Sql),
    ("cap2_feed_links", capFeedLinks _, cap2Sql),
    ("cap3_quarantine", capQuarantine _, cap3Sql),
    ("cap4_stream_lifecycle", capLifecycle _, cap4Sql),
    ("cap5_stream_transitions", capTransitions _, cap5Sql))
}
