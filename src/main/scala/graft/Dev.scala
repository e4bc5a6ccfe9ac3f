package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: `runMain graft.Dev <queryName> [sfDir] [explain]` —
  * prints timings (5 runs after warmup) and optionally the formatted
  * physical plan, for plan-shape iteration (.explain until it's the plan
  * you'd want at 100 TB, not the first one that passed).
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val showPlan = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dev")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "8m")) // see Bench

      .config("spark.sql.adaptive.enabled", "true")
      // AQE-coalesced reads of persisted relations — see Bench
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      // full engine extensions: native functions, DotRewrite, and the
      // graft_asof whole-operator rule/strategy (AsOfJoin.scala)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = SparkEntry.queries(name)
    val df = fn(spark, sfDir)
    if (showPlan) df.explain("formatted")
    val warm0 = System.nanoTime()
    val n = df.collect().length
    println(f"[dev] $name rows=$n warmup=${(System.nanoTime() - warm0) / 1e9}%.3fs")
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[dev] $name times=${times.map(t => f"$t%.3f").mkString(",")} median=${times.sorted.apply(2)}%.3fs")
    spark.stop()
  }
}
