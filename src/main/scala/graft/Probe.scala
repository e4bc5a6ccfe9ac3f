package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (dev-only, not in any gate) — currently dissecting
  * why a cached 256-row d2 result costs 200-750 ms per collect. */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]").appName("probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_MAXPART", "8m"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "16000000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // full engine extensions: native functions, DotRewrite, and the
      // graft_asof whole-operator rule/strategy (AsOfJoin.scala)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 7).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6 }.sorted
      println(f"[probe] $tag median=${ts(3)}%.1f ms all=${ts.map(t => f"$t%.0f").mkString(",")}")
    }

    val d = "/root/testdata/sf0.1"
    val df = graft.queries.Dedup.d2MinhashLsh(spark, d)
    val t0 = System.nanoTime()
    val n = df.collect().length
    println(f"[probe] d2 warmup rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    println(s"[probe] d2 cached partitions = ${df.rdd.getNumPartitions}")
    time("d2_collect") { df.collect() }
    time("d2_count") { df.count() }
    val one = df.coalesce(1)
    time("d2_coalesce1_collect") { one.collect() }
    spark.stop()
  }
}
