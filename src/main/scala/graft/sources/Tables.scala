package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** True iff the failure (anywhere in the cause chain) is Spark 4
    * rejecting a parquet `timestamp[ns]` footer without the legacy
    * conf (error class PARQUET_TYPE_ILLEGAL, "Illegal Parquet type"). */
  private def isIllegalNanos(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("Illegal Parquet type")
    }

  /** Probe events.parquet's RAW in-scan `ts` type, enabling the legacy
    * nanosAsLong conf ONLY when the footer is actually `timestamp[ns]`.
    *
    * The probe runs WITHOUT the conf first: a modern us/NTZ footer
    * resolves cleanly and the conf is never touched, so an unrelated
    * ns-parquet read elsewhere in the session still fails loudly
    * (PARQUET_TYPE_ILLEGAL) instead of silently yielding raw longs —
    * the round-9 "spooky action at a distance" trap, removed. Only a
    * genuine ns events footer flips the conf, and then it must STAY
    * set: the scan consults it lazily at both schema resolution and
    * execution, so restoring it would break the very DataFrame the
    * caller holds (that residual, ns-corpus-only side effect is
    * documented here and spec-pinned in TablesSpec).
    */
  def probeEventsTs(spark: SparkSession, evPath: String): DataType = {
    val resolved =
      try Some(spark.read.parquet(evPath).schema("ts").dataType)
      catch { case e: Throwable if isIllegalNanos(e) => None }
    resolved match {
      case Some(t) => t // LongType here means the legacy conf is already on
      case None =>
        spark.conf.set(NanosKey, "true")
        spark.read.parquet(evPath).schema("ts").dataType // LongType
    }
  }

  /** Normalize a raw-footer `ts` column to a session-TZ TimestampType
    * (all entry points run with session TZ = UTC, so the NTZ wall time
    * and the raw epoch nanos agree on the same instant). */
  def normalizeTs(df: DataFrame, rawType: DataType): DataFrame = rawType match {
    case LongType => // ns footer: raw epoch nanos under the legacy conf
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => // us footer, isAdjustedToUTC=false
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df // already a session-TZ timestamp
  }

  /** Read one table from an sf directory, applying per-table shims. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      val evPath = s"$sfDir/events.parquet"
      val rawType = probeEventsTs(spark, evPath)
      normalizeTs(spark.read.parquet(evPath), rawType)
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
