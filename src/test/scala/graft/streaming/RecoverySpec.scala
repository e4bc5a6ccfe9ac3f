package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery for the STATEFUL event side — the crash-restart
  * half of the exactly-once story. ConnectorSpec proves the capfeed
  * source resumes from its offset checkpoint; this spec proves the
  * windowed AGGREGATION state does: hourlyAgg killed mid-stream (the
  * failure injected AFTER the sink wrote, the worst case — output
  * exists but the batch never committed), restarted from the same
  * checkpoint, must replay exactly the uncommitted batch into
  * IdempotentSink and converge to the same committed output as a run
  * that never failed. A stretch test re-runs the cap4
  * mapGroupsWithState lifecycle on the RocksDB state store provider,
  * pinning that the stateful operators are provider-agnostic (the
  * provider a 1000-executor deployment would use for state larger
  * than heap).
  */
class RecoverySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("recovery-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Split the events table into 4 single-file "arrival" quartiles by
    * event id, plus a far-future sentinel file that pushes the final
    * watermark past every real window (so append mode emits them all).
    * Files get strictly increasing modification times — the order the
    * file source replays them in with maxFilesPerTrigger=1. */
  private def writeArrivalFiles(dir: String): Unit = {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val quartiles = (0 until 4).map(i => ev.filter(col("event_id") % 4 === i))
    val sentinel = spark.createDataFrame(
      java.util.List.of(Row(-1L,
        new java.sql.Timestamp(maxTs.getTime + 10L * 24 * 3600 * 1000),
        -1L, "sentinel", 0.0)),
      eventSchema)
    (quartiles :+ sentinel).zipWithIndex.foreach { case (part, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"ev_part$i").toString
      part.coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"f$i%02d.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() + i * 2000)
    }
  }

  private def hourly(srcDir: String): DataFrame =
    EventStream.hourlyAgg(
      spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", "1") // one arrival file per batch
        .parquet(srcDir))

  /** Run the stream to completion (AvailableNow, one file per batch)
    * through `sinkFn`, returning whether it terminated cleanly. */
  private def run(srcDir: String, ckpt: String,
      sinkFn: (org.apache.spark.sql.Dataset[Row], Long) => Unit): Boolean = {
    val q = hourly(srcDir)
      .writeStream
      .foreachBatch(sinkFn)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.awaitTermination(180000) }
    catch { case _: StreamingQueryException => false }
    finally q.stop()
  }

  test("hourlyAgg killed mid-stream resumes from the checkpoint with exactly-once output") {
    val srcDir = java.nio.file.Files.createTempDirectory("ev_arrivals").toString
    writeArrivalFiles(srcDir)

    // control: the same stream, never failed
    val controlDir = java.nio.file.Files.createTempDirectory("ev_ctl").toString
    assert(run(srcDir, s"$controlDir/_ckpt", IdempotentSink.parquetSink(controlDir)),
      "control stream did not finish")
    val control = IdempotentSink.readBack(spark, controlDir)
      .collect().map(_.toString).sorted.toSeq
    assert(control.nonEmpty, "control stream emitted no closed windows")

    // failure run: batch 2's sink write SUCCEEDS, then the batch dies
    // before committing — the worst-case at-least-once window
    val outDir = java.nio.file.Files.createTempDirectory("ev_rec").toString
    val ckpt = s"$outDir/_ckpt"
    val armed = new AtomicBoolean(true)
    val failingSink: (org.apache.spark.sql.Dataset[Row], Long) => Unit =
      (batch, id) => {
        IdempotentSink.parquetSink(outDir)(batch, id)
        if (id == 2 && armed.getAndSet(false))
          throw new RuntimeException("injected crash after sink write")
      }
    assert(!run(srcDir, ckpt, failingSink), "failure was not injected")

    // restart from the SAME checkpoint: must replay batch 2 (written
    // but uncommitted), then drain the remaining files
    assert(run(srcDir, ckpt, IdempotentSink.parquetSink(outDir)),
      "recovery run did not finish")

    val recovered = IdempotentSink.readBack(spark, outDir)
    val got = recovered.collect().map(_.toString).sorted.toSeq
    assert(got == control,
      s"recovered output differs from the never-failed control:\n got=$got\nwant=$control")
    // exactly-once: no window emitted twice across the replay boundary
    assert(recovered.select("hour_epoch").distinct().count() == recovered.count(),
      "a window was emitted more than once after recovery")
  }

  test("cap4 lifecycle is state-store-provider agnostic (RocksDB == default HDFS provider)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    def runLifecycle(): Seq[String] =
      graft.queries.CapQueries.capLifecycle(spark, sf)
        .collect().map(_.toString).sorted.toSeq
    val default = runLifecycle()
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rocks = runLifecycle()
      assert(rocks == default && default.nonEmpty,
        "mapGroupsWithState lifecycle differs between state store providers")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
