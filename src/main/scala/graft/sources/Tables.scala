package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst pushes filters and prunes
  * columns into the scan, so callers should express predicates on the
  * returned DataFrame and let pushdown do its job (verified via
  * `.explain("formatted")` → `PushedFilters`/`ReadSchema`).
  *
  * The only special case is `events`: its `ts` column has shipped with
  * two different parquet footers across driver data generations —
  * `timestamp[ns]`, which Spark 4 rejects (`PARQUET_TYPE_ILLEGAL`)
  * unless `spark.sql.legacy.parquet.nanosAsLong=true` is set and then
  * surfaces as a raw nanosecond long, and `timestamp[us]`
  * (isAdjustedToUTC=false), which surfaces as TIMESTAMP_NTZ. Both are
  * normalized to a session-TZ TimestampType here (all entry points run
  * with `spark.sql.session.timeZone=UTC`, so the NTZ wall time and the
  * raw epoch nanos agree on the same instant).
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory, applying per-table shims. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // Runtime-settable SQL conf; must be in place when the scan's
      // schema is resolved AND when it executes (both lazy), so it is
      // deliberately NOT restored afterwards. Session-wide side effect:
      // any later parquet read of ns-timestamp columns in this session
      // will also see them as raw longs instead of failing — acceptable
      // here because events.parquet is the only ns-timestamp input and
      // every events access goes through this method.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType => // ns footer: raw epoch nanos under the legacy conf
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => // us footer, isAdjustedToUTC=false
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw // already a session-TZ timestamp
      }
    case other =>
      spark.read.parquet(s"$sfDir/$other.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
