package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** CAP-family scale probe. The cap* surfaces read XML alert FILES
  * (fixtures/cap — the reference's input format, one CAP document per
  * HTTP fetch), not parquet tables, so [[ScaleGen]]'s parquet tiler
  * cannot scale them. This probe replicates the fixture set N× with
  * REWRITTEN identifiers — each copy is a distinct alert, so the
  * pipeline's dedup/fan-out/validity stages see N× the alerts rather
  * than N copies collapsing to one — then times the full
  * [[graft.cap.CapPipeline]] (parse → validity → geometry → features)
  * over the replicated corpus and prints one JSON line.
  *
  * Replication is driver-side file IO by design: the fixture set is
  * 64 KB; at ×1000 it writes 15k files / ~64 MB, which models the real
  * deployment shape (many small alert documents) better than any
  * row-tiling would. The timed section is pure engine work.
  *
  * Usage: runMain graft.CapScaleProbe [copies] [srcDir] [workDir] [badSrcDir]
  */
object CapScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val src = if (args.length > 1) args(1) else "fixtures/cap"
    val work = if (args.length > 2) args(2) else "/tmp/cap_scale/xml"

    def replicate(srcDir: String, outDir: java.io.File): Int = {
      if (outDir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(outDir)
      outDir.mkdirs()
      val files = new java.io.File(srcDir).listFiles()
        .filter(_.getName.endsWith(".xml")).sortBy(_.getName)
      require(files.nonEmpty, s"no XML fixtures under $srcDir")
      files.foreach { f =>
        val body = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        (0 until n).foreach { t =>
          // distinct alert identity per copy; files WITHOUT an
          // identifier (the missing-identifier fixture) replicate
          // verbatim — each copy still exercises the reject path
          val rewritten = body.replaceAll(
            "<identifier>([^<]*)</identifier>", s"<identifier>$$1-t$t</identifier>")
          Files.write(
            new java.io.File(outDir, s"${f.getName.stripSuffix(".xml")}-t$t.xml").toPath,
            rewritten.getBytes(StandardCharsets.UTF_8))
        }
      }
      files.length * n
    }
    val dir = new java.io.File(work)
    val badDir = new java.io.File(work + "_bad")
    val genT0 = System.nanoTime()
    val nFiles = replicate(src, dir)
    // the quarantine surface needs the PLANTED-bad fixture set (cap3's
    // corpus) at the same scale. It is a SEPARATE argument from srcDir:
    // replicating a custom srcDir here (which has no planted-bad
    // alerts) would silently measure the wrong corpus and report
    // quarantined=0 — the quarantine side always gets a corpus that
    // actually contains bad alerts.
    val badSrc = if (args.length > 3) args(3) else
      graft.queries.CapQueries.badFixtureDir
    val nBad = replicate(badSrc, badDir)
    val genSec = (System.nanoTime() - genT0) / 1e9

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cap-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val asOf = graft.queries.CapQueries.asOf
    // warmup (JIT + file listing), then timed runs — probe protocol:
    // SPARK_GRAFT_RUNS timed executions (default 1, like Bench probes)
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(1)
    def once(): Long = graft.cap.CapPipeline.run(spark, work, asOf).count()
    val features = once()
    val walls = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      once()
      (System.nanoTime() - t0) / 1e9
    }
    // quarantine side at the same scale, over the planted-bad corpus
    import spark.implicits._
    val xml = spark.read.option("wholetext", "true")
      .text(badDir.toString).as[String]
    val alerts = graft.cap.CapPipeline.filterActive(
      graft.cap.CapPipeline.parseAlerts(xml), asOf)
    val qT0 = System.nanoTime()
    val quarantined = graft.cap.CapPipeline
      .toFeaturesWithQuarantine(alerts, persist = false).quarantine.count()
    val qSec = (System.nanoTime() - qT0) / 1e9

    // cap4/cap5 STREAM drains at the same scale (r14 verdict task 6).
    // The lifecycle chains replicate like the batch corpus: every file
    // of one Alert→Update*→Cancel chain carries the SAME identifier,
    // so the per-copy rewrite keeps each copy a complete independent
    // chain — N× the live alert ids, N× the mapGroupsWithState /
    // flatMapGroupsWithState state rows. Drained through the standard
    // StreamRunner path (RocksDB state, exactly-once file sink,
    // AvailableNow). requireSingleDataBatch is deliberately NOT
    // asserted: at probe scale the file source legitimately splits
    // into multiple micro-batches, which is exactly the cross-batch
    // state accumulation worth measuring (the golden oracles, which DO
    // depend on one batch, run at fixture scale only).
    import org.apache.spark.sql.functions.{col, concat_ws}
    val lcDir = new java.io.File(work + "_lifecycle")
    val nLc = replicate(graft.queries.CapQueries.lifecycleFixtureDir, lcDir)
    def drain(sink: String, df: org.apache.spark.sql.DataFrame): Long =
      graft.streaming.StreamRunner.run(spark, sink, lcDir.toString, df, "update").count()
    def cap4(): Long = drain("cap4_scale_sink",
      graft.streaming.CapStream.lifecycle(
          graft.streaming.CapStream.alerts(spark, lcDir.toString)).toDF()
        .select(col("identifier"), col("status"),
          concat_ws("|", col("msgTypes")).as("msg_chain"),
          col("lastSent").as("last_sent")))
    def cap5(): Long = drain("cap5_scale_sink",
      graft.streaming.CapStream.lifecycleTransitions(
          graft.streaming.CapStream.alerts(spark, lcDir.toString)).toDF()
        .select(col("identifier"), col("fromStatus").as("from_status"),
          col("toStatus").as("to_status"), col("msgType").as("msg_type"),
          col("sent")))
    def timed(f: () => Long): (Long, Seq[Double]) = {
      val rows = f() // warmup drain (JIT, RocksDB natives, listing)
      val ws = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      (rows, ws)
    }
    val (cap4Rows, cap4Walls) = timed(cap4 _)
    val (cap5Rows, cap5Walls) = timed(cap5 _)

    println(
      s"""{"cap_scale_probe":{"copies":$n,"files":$nFiles,"bad_files":$nBad,""" +
        s""""gen_sec":${f"$genSec%.1f"},"features":$features,""" +
        s""""pipeline_sec":${walls.map(w => f"$w%.1f").mkString("[", ",", "]")},""" +
        s""""quarantined":$quarantined,"quarantine_sec":${f"$qSec%.1f"},""" +
        s""""lifecycle_files":$nLc,"cap4_rows":$cap4Rows,""" +
        s""""cap4_wall_sec":${cap4Walls.map(w => f"$w%.1f").mkString("[", ",", "]")},""" +
        s""""cap5_rows":$cap5Rows,""" +
        s""""cap5_wall_sec":${cap5Walls.map(w => f"$w%.1f").mkString("[", ",", "]")}}}""")
    graft.streaming.StateBackend.shutdown()
    spark.stop()
  }
}
