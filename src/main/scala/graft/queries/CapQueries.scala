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

  /** Full pipeline: alert XML fixtures → CoT features. The Encoder
    * already maps icon: Option[String] to a nullable string column. */
  def capFeatures(s: SparkSession, d: String): DataFrame =
    CapPipeline.run(s, fixtureDir, asOf)
      .toDF()
      .orderBy(col("id"))

  /** P1-P3: feed-link extraction over RSS+Atom fixture feeds. */
  def capFeedLinks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feeds = s.read.option("wholetext", "true").text(feedDir).as[String]
    CapPipeline.parseFeedLinks(feeds).toDF("link").orderBy(col("link"))
  }

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    ("cap1_features", capFeatures _),
    ("cap2_feed_links", capFeedLinks _))
}
