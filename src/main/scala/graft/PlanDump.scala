package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness: dump `.explain("formatted")`
  * for every SparkEntry query to `<outDir>/<name>_<tag>.txt` under
  * Bench-identical session confs, so plan-shape claims (Exchange count,
  * join strategy, PushedFilters/ReadSchema, codegen spans) are checkable
  * files, not prose. `runMain graft.PlanDump <outDir> <tag> [sfDir] [nameRegex]`.
  *
  * The dump is plan-only (no execution) except for builders that run a
  * stream or write a table as part of construction — those run exactly as
  * they do under Verify/Bench, and their dumped plan is the final
  * DataFrame the driver hashes.
  *
  * `SPARK_GRAFT_PLAN_EXEC=1` executes each query FIRST (a `collect()`,
  * driving the DataFrame's own QueryExecution — a noop-sink write would
  * plan a separate write QueryExecution and leave this one unexecuted)
  * and dumps the plan afterwards, so AQE sections show the FINAL runtime
  * plan (`isFinalPlan=true`: runtime join strategy, coalesced reads, and
  * exchange/stage reuse) instead of the static initial plan — static
  * `.explain` under AQE shows zero ReusedExchange even where the runtime
  * stage cache collapses every repeated subtree.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only = if (args.length > 3) Some(args(3).r) else None
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      // Bench-identical confs — the plans must be the ones the bench runs
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "16000000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    def naturalKey(n: String): String =
      "\\d+".r.replaceAllIn(n, m => f"${m.matched.toInt}%06d")
    SparkEntry.queries.toSeq.sortBy(t => naturalKey(t._1))
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          if (exec) df.collect()
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
          println(s"[plandump] $name ok")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    graft.streaming.StateBackend.shutdown()
    spark.stop()
  }
}
